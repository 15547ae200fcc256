"""Scale probe for semantic_dedup (SemDeDup): does the cluster-scoped
embedding dedup hold its ≈linear claim when the corpus AND the cluster
count grow together (k ∝ n, the documented deployment: constant
target cluster size ⇒ per-task work constant, pairwise work Θ(n²/k) ∝ n)?

Synthesizes deterministic pseudo-embeddings in-plan (sin curves over the
id — no RNG state, layout-independent), runs the full pipeline
(k-means train → assign → blocked within-cluster scan) at each factor,
and prints wall times, the scaling exponent, and driver RSS.

Usage: python scripts/semdedup_probe.py [assigner] [factors ...]
(default: hierarchical 1 10; pass 'partitioned' to probe the
no-driver-matrix assigner — same routing, member centroids cogrouped;
pass 'incremental' to probe semantic_dedup_increment — the corpus is
split into 4 id-ordered increments against a residents dir and each
increment's wall is reported separately: the claim under test is that
per-increment cost stays ~flat as residents accumulate, i.e.
Θ(N·(R+N)/k) with k ∝ total corpus, not a rescan; pass 'stream' to
probe semantic_dedup_stream — the same 4-way id-ordered replay through
the streaming engine, reporting per-trigger wall and state-store
rows/bytes from the query progress; pass 'handoff' to probe the
residents export + bootstrap_dir seed cost vs a full replay)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_N = 2_000      # sf0.1 embeddings row count
DIM = 16
TARGET_CLUSTER = 125  # BASE_N/16 — keeps k ∝ n from factor 1


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def synth(spark, n: int):
    """Shape-honest corpus: vectors are uniform hash noise (NO locality —
    a curve construction would pack more points per unit length as n
    grows, inflating dup density superlinearly), with every id ≡ 1
    (mod 100) a planted near-duplicate of its predecessor, so the
    duplicate RATE is constant across factors."""
    from pyspark.sql import functions as F

    base = F.when(F.col("id") % 100 == 1, F.col("id") - 1).otherwise(
        F.col("id")
    )
    dims = [
        (
            (F.xxhash64(base, F.lit(d)) / F.lit(float(2**63))).cast("float")
            # planted dup: nudge dim 0 so the pair is near- not exact-dup
            + F.when(
                (F.col("id") % 100 == 1) & (F.lit(d) == 0), F.lit(1e-4)
            ).otherwise(F.lit(0.0)).cast("float")
        )
        for d in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*dims).alias("embedding")
    )


def _incremental_probe(spark, factors) -> None:
    """Per-increment wall of semantic_dedup_increment as residents
    accumulate: 4 equal id-ordered increments of a factor-F corpus,
    fixed k ∝ total. Flat per-increment walls = the Θ(N·(R+N)/k) claim;
    a growing tail would mean the scan is secretly rescanning
    residents' own pairs."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from summingbird_spark.functions.dedup import semantic_dedup_increment
    from summingbird_spark.functions.similarity import kmeans_train

    for f in factors:
        n = BASE_N * f
        k = max(16, n // TARGET_CLUSTER)
        emb = synth(spark, n)
        cent = kmeans_train(
            emb, k, n_iter=4, sample_fraction=min(1.0, 50_000 / n)
        )
        # persist the quantizer like a real deployment (cost excluded —
        # the probe measures the increments)
        cent = spark.createDataFrame(cent.collect(), cent.schema)
        root = tempfile.mkdtemp(prefix="sbspark-incsem-probe-")
        walls = []
        dropped = 0
        q = n // 4
        for i in range(4):
            lo, hi = i * q, (i + 1) * q if i < 3 else n
            batch = emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            t0 = time.perf_counter()
            out = semantic_dedup_increment(
                spark, root, i, batch, 0.995, cent
            )
            d = out.agg(
                F.sum((~F.col("is_survivor")).cast("long"))
            ).first()[0] or 0
            walls.append(time.perf_counter() - t0)
            dropped += int(d)
            print(f"[incremental] factor {f} inc {i}: rows={hi - lo} "
                  f"residents={lo} wall={walls[-1]:.2f}s dropped+= {d} "
                  f"rss={rss_mb():.0f}MiB", flush=True)
        shutil.rmtree(root, ignore_errors=True)
        ratio = walls[-1] / walls[0] if walls[0] > 0 else float("nan")
        print(f"[incremental] factor {f}: n={n} k={k} walls="
              f"{', '.join(f'{w:.2f}' for w in walls)} "
              f"last/first={ratio:.2f} total_dropped={dropped}", flush=True)


def _stream_probe(spark, factors) -> None:
    """Per-micro-batch trigger wall of semantic_dedup_stream as residents
    accumulate: a factor-F corpus replayed as 4 id-ordered chunk files
    (maxFilesPerTrigger=1), fixed centroids with k ∝ total. The claim
    under test is the same Θ(N·(R+N)/k) shape as the incremental probe,
    now through the streaming engine's state lifecycle — flat(ish)
    per-trigger walls and state bytes linear in residents; a growing
    tail would mean the kernel rescans residents' own pairs (or state
    ser/de is superlinear)."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from summingbird_spark.functions.similarity import kmeans_train
    from summingbird_spark.streaming.dedup import semantic_dedup_stream

    for f in factors:
        n = BASE_N * f
        k = max(16, n // TARGET_CLUSTER)
        emb = synth(spark, n)
        cent = kmeans_train(
            emb, k, n_iter=4, sample_fraction=min(1.0, 50_000 / n)
        )
        cent = spark.createDataFrame(cent.collect(), cent.schema)
        src = tempfile.mkdtemp(prefix="sbspark-semdd-stream-src-")
        q4 = n // 4
        for i in range(4):
            lo, hi = i * q4, (i + 1) * q4 if i < 3 else n
            tmp = os.path.join(src, f"w{i}")
            emb.where(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).coalesce(1).write.parquet(tmp)
            dst = os.path.join(src, f"chunk{i}.parquet")
            shutil.move(glob.glob(tmp + "/*.parquet")[0], dst)
            shutil.rmtree(tmp)
            os.utime(dst, times=(1e9 + 10.0 * i, 1e9 + 10.0 * i))
        work = tempfile.mkdtemp(prefix="sbspark-semdd-stream-work-")
        stream = (
            spark.readStream
            .schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = semantic_dedup_stream(stream, 0.995, centroids=cent)
        t0 = time.perf_counter()
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _b: bdf.write.mode("append").parquet(f"{work}/out")
            )
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(1800), "stream probe did not finish"
        wall = time.perf_counter() - t0
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        per_batch = [p["durationMs"]["triggerExecution"] / 1e3 for p in prog]
        state = [
            (p["stateOperators"][0]["numRowsTotal"],
             p["stateOperators"][0]["memoryUsedBytes"])
            for p in prog
        ]
        dropped = (
            spark.read.parquet(f"{work}/out")
            .agg(F.sum((~F.col("is_survivor")).cast("long"))).first()[0]
        )
        ratio = per_batch[-1] / per_batch[0] if per_batch[0] > 0 else float("nan")
        print(f"[stream] factor {f}: n={n} k={k} total_wall={wall:.2f}s "
              f"per-trigger={', '.join(f'{w:.2f}' for w in per_batch)}s "
              f"last/first={ratio:.2f} dropped={dropped} "
              f"state_rows={[s[0] for s in state]} "
              f"state_MiB={[round(s[1] / 2**20, 1) for s in state]} "
              f"rss={rss_mb():.0f}MiB", flush=True)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


def _handoff_probe(spark, factors) -> None:
    """Cost of the batch→stream residents handoff vs the replay it
    avoids: the first 3/4 of a factor-F corpus becomes an
    `export_semantic_residents` layout; the last 1/4 streams over it
    with `bootstrap_dir=`. Reported: export wall, the bootstrapped
    stream's per-trigger walls (the FIRST trigger carries the seed
    load), and the baseline wall of streaming ALL of the corpus from
    empty state — the replay a handoff-less deployment would pay."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from summingbird_spark.functions.similarity import (
        ivf_assign_hierarchical, kmeans_train,
    )
    from summingbird_spark.streaming.dedup import (
        export_semantic_residents, semantic_dedup_stream,
    )

    def stage(df, src, n_chunks, lo, hi):
        os.makedirs(src, exist_ok=True)
        q = (hi - lo) // n_chunks
        for i in range(n_chunks):
            a = lo + i * q
            b = lo + (i + 1) * q if i < n_chunks - 1 else hi
            tmp = os.path.join(src, f"w{i}")
            df.where(
                (F.col("vec_id") >= a) & (F.col("vec_id") < b)
            ).coalesce(1).write.parquet(tmp)
            dst = os.path.join(src, f"chunk{i}.parquet")
            shutil.move(glob.glob(tmp + "/*.parquet")[0], dst)
            shutil.rmtree(tmp)
            os.utime(dst, times=(1e9 + 10.0 * i, 1e9 + 10.0 * i))

    def run_stream(src, work, cent, boot=None):
        stream = (
            spark.readStream
            .schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = semantic_dedup_stream(
            stream, 0.995, centroids=cent, bootstrap_dir=boot)
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _b: bdf.write.mode("append").parquet(
                    f"{work}/out")
            )
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(1800)
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        return [p["durationMs"]["triggerExecution"] / 1e3 for p in prog]

    for f in factors:
        n = BASE_N * f
        k = max(16, n // TARGET_CLUSTER)
        cut = (3 * n) // 4
        emb = synth(spark, n)
        cent = kmeans_train(
            emb, k, n_iter=4, sample_fraction=min(1.0, 50_000 / n))
        cent = spark.createDataFrame(cent.collect(), cent.schema)

        # batch history -> residents export
        t0 = time.perf_counter()
        history = emb.where(F.col("vec_id") < cut)
        residents = ivf_assign_hierarchical(history, cent).select(
            "vec_id", "embedding", "centroid_id")
        boot = tempfile.mkdtemp(prefix="sbspark-handoff-boot-")
        export_semantic_residents(residents, boot)
        export_wall = time.perf_counter() - t0

        # bootstrapped stream over the last quarter (2 triggers)
        src_tail = tempfile.mkdtemp(prefix="sbspark-handoff-tail-")
        stage(emb, src_tail, 2, cut, n)
        work = tempfile.mkdtemp(prefix="sbspark-handoff-work-")
        tail_walls = run_stream(src_tail, work, cent, boot=boot)

        # baseline: replay EVERYTHING from empty state (4 triggers)
        src_all = tempfile.mkdtemp(prefix="sbspark-handoff-all-")
        stage(emb, src_all, 4, 0, n)
        work2 = tempfile.mkdtemp(prefix="sbspark-handoff-work2-")
        replay_walls = run_stream(src_all, work2, cent)

        print(f"[handoff] factor {f}: n={n} k={k} residents={cut} "
              f"export={export_wall:.2f}s "
              f"tail-triggers={', '.join(f'{w:.2f}' for w in tail_walls)}s "
              f"(first carries seed load) "
              f"replay-total={sum(replay_walls):.2f}s "
              f"({', '.join(f'{w:.2f}' for w in replay_walls)}) "
              f"rss={rss_mb():.0f}MiB", flush=True)
        for d in (boot, src_tail, work, src_all, work2):
            shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    assigner = "hierarchical"
    if args and not args[0].isdigit():
        assigner = args[0]
        args = args[1:]
    factors = [int(a) for a in args] or [1, 10]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from summingbird_spark.functions.dedup import semantic_dedup

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    if assigner == "incremental":
        _incremental_probe(spark, factors)
        spark.stop()
        return
    if assigner == "stream":
        _stream_probe(spark, factors)
        spark.stop()
        return
    if assigner == "handoff":
        _handoff_probe(spark, factors)
        spark.stop()
        return

    rows = []
    for f in factors:
        n = BASE_N * f
        k = max(16, n // TARGET_CLUSTER)
        emb = synth(spark, n)
        ts = []
        stats = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = semantic_dedup(
                emb, threshold=0.995, k_clusters=k, n_iter=4,
                sample_fraction=min(1.0, 50_000 / n),
                assigner=assigner,
            )
            from pyspark.sql import functions as F

            stats = out.agg(
                F.count("*").alias("rows"),
                F.sum((~F.col("is_survivor")).cast("long")).alias("dropped"),
            ).first()
            ts.append(time.perf_counter() - t0)
        rows.append((f, n, k, min(ts), stats["rows"], stats["dropped"], rss_mb()))
        print(f"[{assigner}] factor {f}: n={n} k={k} wall={min(ts):.2f}s "
              f"(runs: {', '.join(f'{t:.2f}' for t in ts)}) "
              f"rows={stats['rows']} dropped={stats['dropped']} "
              f"rss={rss_mb():.0f}MiB", flush=True)

    print()
    print("| factor | rows | clusters | wall s | dropped | driver RSS MiB |")
    print("|---|---|---|---|---|---|")
    for f, n, k, w, r, d, m in rows:
        print(f"| {f} | {n} | {k} | {w:.2f} | {d} | {m:.0f} |")
    if len(rows) >= 2:
        (f1, _, _, w1, *_), (f2, _, _, w2, *_) = rows[-2], rows[-1]
        exp = math.log(w2 / w1) / math.log(f2 / f1)
        print(f"# wall exponent over the last step = {exp:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
