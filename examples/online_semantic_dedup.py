"""Online SemDeDup with a batch→stream handoff — the lambda split for
embedding-level curation:

  1. BATCH: dedup the corpus history offline (``semantic_dedup`` against
     the persisted IVF index's cluster assignment).
  2. EXPORT: write the seen rows as a residents bootstrap
     (``export_semantic_residents`` — one partition dir per centroid,
     manifest-pinned layout).
  3. STREAM: new documents arrive as micro-batches;
     ``semantic_dedup_stream(bootstrap_dir=...)`` seeds each cluster's
     resident state from the export on first touch and continues online
     with ZERO replay of the history — a new arrival near-duplicating a
     YEARS-OLD document is dropped, with the old document as its witness.
  4. CHECK: the streamed decisions equal the one-shot batch scan over
     history ∪ stream (the operator's monotone-id equivalence contract).

Reference anchor: the reference's offline/online split with the client
merge (summingbird-client/src/main/scala/com/twitter/summingbird/store/
ClientStore.scala) — here the "merge" is state carry-in, not a read-time
join, because dedup decisions are made at ingest.

Run:
    python examples/online_semantic_dedup.py [sf_dir] [work_dir]
"""

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="sbspark-online-semdd-")
    os.makedirs(work, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("online-semantic-dedup")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from summingbird_spark.functions.dedup import semantic_dedup
    from summingbird_spark.functions.similarity import ensure_ivf_index
    from summingbird_spark.streaming.dedup import (
        export_semantic_residents, semantic_dedup_stream,
    )
    from summingbird_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0] or 0
    cut = (2 * hi) // 3
    history = emb.where(F.col("vec_id") <= cut)
    arriving = emb.where(F.col("vec_id") > cut)

    # 1. BATCH: offline dedup of the history (persisted IVF quantization)
    centroids, _ = ensure_ivf_index(
        spark, sf_dir, k=32, n_iter=5, sample_fraction=0.5)
    batch_decisions = semantic_dedup(
        history, threshold=0.4, k_clusters=32, centroids=centroids)
    n_hist = batch_decisions.count()
    n_dropped = batch_decisions.where(~F.col("is_survivor")).count()
    print(f"batch history: {n_hist} docs, {n_dropped} semantic dups dropped")

    # 2. EXPORT: every seen row (dropped docs included — the witness
    # contract) becomes a carried-in resident
    residents = (
        batch_decisions.where(F.col("centroid_id").isNotNull())
        .select("vec_id", "centroid_id")
        .join(history.select("vec_id", "embedding"), "vec_id")
    )
    boot = os.path.join(work, "residents")
    n_res = export_semantic_residents(residents, boot)
    print(f"exported {n_res} residents -> {boot}")

    # 3. STREAM: the arriving tail replays as micro-batches over the
    # carried-in state — no history replay
    src = os.path.join(work, "src")
    os.makedirs(src, exist_ok=True)
    stage = os.path.join(work, "stage")
    arriving.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.move(glob.glob(stage + "/*.parquet")[0],
                os.path.join(src, "chunk0.parquet"))
    shutil.rmtree(stage)

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = semantic_dedup_stream(
        stream, 0.4, centroids=centroids, bootstrap_dir=boot)
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _b: bdf.write.mode("append").parquet(
                os.path.join(work, "out"))
        )
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    streamed = spark.read.parquet(os.path.join(work, "out"))

    # 4. CHECK: handoff == one-shot over history ∪ stream
    one = semantic_dedup(
        emb, threshold=0.4, k_clusters=32, centroids=centroids
    ).where(F.col("vec_id") > cut)
    j = streamed.alias("s").join(one.alias("o"), "vec_id")
    agree = j.agg(F.min(
        (F.col("s.is_survivor") == F.col("o.is_survivor"))
        & F.col("s.nearest_prior_id").eqNullSafe(F.col("o.nearest_prior_id"))
    )).first()[0]
    n_stream = streamed.count()
    n_old_witness = streamed.where(
        ~F.col("is_survivor") & (F.col("nearest_prior_id") <= cut)
    ).count()
    print(f"streamed tail: {n_stream} docs; "
          f"{n_old_witness} dropped against a HISTORICAL resident")
    print(f"handoff matches one-shot truth: {bool(agree)}")
    spark.stop()
    if not agree:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
