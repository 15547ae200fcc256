"""Round-17 sf1 scaling probe (VERDICT r16 item 7): run the top bench
rows against a deterministic 10x replica of sf0.1 (~sf1) at the current
$SPARK_GRAFT_CPUS, so an 8-core vs 32-core pair of runs measures how
each row scales once there is enough data to be CPU-bound.

Replica shape (same discipline as scripts/scale_probe.py — never touches
/root/testdata): documents get replica-prefixed tokens (no cross-replica
vocabulary, so dup/jaccard workloads scale linearly); events get
disjoint user/event id spaces with identical timestamps (row rate
scales, horizon does not); embeddings get disjoint vec_ids and a
deterministic per-replica perturbation (hash-derived, +-0.025/dim) so
replicas are not exact near-dups of each other and the semantic-dedup
workload stays ~linear in the factor. The TPC-H side tables are copied
verbatim (no probed row scans them at scale).

Usage: SPARK_GRAFT_CPUS=8 python scripts/r17_sf1_probe.py [row ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/sbspark-r17-sf1"
FACTOR = 10
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

ROWS = [
    "semantic_dedup",
    "semantic_dedup_partitioned",
    "incremental_semantic_dedup",
    "corpus_to_shards",
    "dedup_clusters",
    "dedup_survivors",
    "remove_duplicate_spans",
    "stream_sum_by_key",
    "stream_quantile_by_key",
    "stream_buffer_join",
    "lambda_avg_by_user",
    "pmi_cooccurrence",
]


def ensure_replicas(spark) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(ROOT, f"x{FACTOR}")
    marker = os.path.join(out, "_REPLICA_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    from summingbird_spark.sources.tables import read_parquet

    # documents: replica-prefixed tokens, disjoint doc_ids
    docs = read_parquet(spark, os.path.join(BASE, "documents.parquet"))
    parts = []
    for i in range(FACTOR):
        if i == 0:
            parts.append(docs)
            continue
        pfx = F.lit(f"r{i}x")
        parts.append(
            docs.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
                F.array_join(
                    F.transform(F.split("text", " "), lambda t: F.concat(pfx, t)),
                    " ",
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    # events: disjoint key spaces, identical horizon
    ev = read_parquet(spark, os.path.join(BASE, "events.parquet"))
    parts = []
    for i in range(FACTOR):
        if i == 0:
            parts.append(ev)
            continue
        parts.append(
            ev.select(
                (F.col("event_id") + 10_000_000 * i).alias("event_id"),
                "ts",
                (F.col("user_id") + 10_000_000 * i).alias("user_id"),
                "event_type", "value", "props",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    # embeddings: disjoint vec_ids, deterministic per-replica jitter
    emb = read_parquet(spark, os.path.join(BASE, "embeddings.parquet"))
    parts = []
    for i in range(FACTOR):
        if i == 0:
            parts.append(emb)
            continue
        vid = (F.col("vec_id") + 10_000_000 * i).alias("vec_id")
        elem_t = emb.schema["embedding"].dataType.elementType.simpleString()
        jit = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + (
                    F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit(i)), F.lit(1000))
                    / 1000.0
                    - 0.5
                )
                * 0.05
            ).cast(elem_t),
        ).alias("embedding")
        others = [c for c in emb.columns if c not in ("vec_id", "embedding")]
        parts.append(emb.select(vid, jit, *others))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    # verbatim side tables
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copy(src, dst) if os.path.isfile(src) else shutil.copytree(src, dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def main() -> None:
    rows = sys.argv[1:] or ROWS
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"r17-sf1-probe-{CPUS}")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_replicas(spark)

    from summingbird_spark.queries import QUERIES
    from summingbird_spark.sources.tables import load_table
    from summingbird_spark.functions.similarity import ensure_ivf_index

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "documents").count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    t0 = time.perf_counter()
    ensure_ivf_index(spark, sf_dir, k=32, n_iter=5, sample_fraction=0.5)
    ensure_ivf_index(spark, sf_dir, k=96, n_iter=4, sample_fraction=0.5)
    print(json.dumps({"setup_ivf_sec": round(time.perf_counter() - t0, 3),
                      "cpus": CPUS, "factor": FACTOR}), flush=True)
    # stream warmup
    import tempfile

    warm = tempfile.mkdtemp(prefix="sf1-warm-")
    spark.createDataFrame([("k", 1.0)], "key string, value double").coalesce(
        1
    ).write.parquet(f"{warm}/src")
    wq = (
        spark.readStream.schema("key string, value double")
        .parquet(f"{warm}/src").groupBy("key").count()
        .writeStream.format("noop")
        .option("checkpointLocation", f"{warm}/ckpt")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    wq.awaitTermination(120)
    shutil.rmtree(warm, ignore_errors=True)

    for name in rows:
        try:
            times = []
            for i in range(2):
                spark.sparkContext.setJobDescription(f"sf1 {name} run{i}")
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            print(json.dumps({"row": name, "cpus": CPUS, "times": times,
                              "min": min(times)}), flush=True)
        except Exception as e:
            print(json.dumps({"row": name, "cpus": CPUS,
                              "error": str(e)[:200]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
