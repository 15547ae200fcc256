"""Hot-key probe (VERDICT r12 item 6): ONE key absorbing 10^6 rows in a
single trigger — the celebrity-key shape, where in the reference one
Storm Summer task receives a viral key's entire event volume
(summingbird-online: the AsyncSummer exists so that task never folds
per-event). The r12/r13 fast-agg kernels (sum/count/min/max + r13
avg/moments) and the r12 bincount quantile sketch claim this shape folds
at numpy constants; this measures it end-to-end through the REAL
streaming path (StreamPlanner → applyInPandasWithState → state store):

* per-trigger stateful update time (allUpdatesTimeMs) at 10^4 vs 10^6
  rows on the same single key → the slope is the kernel's row cost; a
  per-row python fold would show ~100x, numpy shows the scan cost only;
* state bytes after the trigger → hot keys must grow per-trigger WORK,
  never per-key STATE (one carrier per (key, batch): O(1) for
  sum/avg/moments, O(bins) for the sketch).

Usage: python scripts/hotkey_probe.py [rows ...]   (default 10000 1000000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/sbspark-hotkey"


def make_corpus(spark, n: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(ROOT, f"n{n}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    (
        spark.range(n)
        .select(
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("id") % 86_000)).alias("ts"),
            F.lit("celeb").alias("key"),
            (F.col("id") % 1000 - 500).alias("value"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def run_one(spark, src_dir: str, semigroup: str) -> dict:
    import summingbird_spark as sb
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    schema = "ts timestamp, key string, value long"
    src = stream_source(src_dir, schema, time_col="ts")
    p = src.sum_by_key("key", "value", semigroup=semigroup,
                       batcher=sb.of_days(1))
    plan = StreamPlanner(spark).plan(p)
    work = tempfile.mkdtemp(prefix="sbspark-hotkey-")
    t0 = time.perf_counter()
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save(),
        checkpoint=f"{work}/ckpt",
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    lp = q.lastProgress or {}
    op = (lp.get("stateOperators") or [{}])[0]
    shutil.rmtree(work, ignore_errors=True)
    return {
        "wall_sec": wall,
        "update_ms": op.get("allUpdatesTimeMs"),
        "state_rows": op.get("numRowsTotal"),
        "state_bytes": op.get("memoryUsedBytes"),
    }


def make_shared_bucket_corpus(spark, n_hot: int, n_cold: int,
                              key_buckets: int) -> str:
    """Two chunk files: chunk 0 primes the state with ``n_cold`` cold keys
    that hash into the SAME physical bucket as the hot key (bucket =
    pmod(xxhash64(key, 42), key_buckets) — the summer's layout); chunk 1
    is the hot trigger, ``n_hot`` rows on the one celebrity key. With
    maxFilesPerTrigger=1 the hot trigger then re-serializes a bucket dict
    holding all the cold entries — the write-amplification shape.
    ``n_cold=0`` gives the isolated twin with the same 2-trigger
    lifecycle (chunk 0 = one celeb row)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    out = os.path.join(ROOT, f"shared_h{n_hot}_c{n_cold}_b{key_buckets}")
    if os.path.exists(os.path.join(out, "chunk1.parquet")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # the summer's layout is pmod(xxhash64(key), buckets) — xxhash64 with
    # its DEFAULT seed; adding a literal arg would hash an extra column
    # and compute a different (wrong) bucket
    celeb_bucket = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit("celeb")), F.lit(key_buckets)).alias("b"))
        .collect()[0].b
    )
    if n_cold:
        cold = (
            spark.range(200_000)
            .select(F.concat(F.lit("cold"), F.col("id")).alias("key"))
            .where(
                F.pmod(F.xxhash64(F.col("key")), F.lit(key_buckets))
                == celeb_bucket
            )
            .limit(n_cold)
            .select(
                F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
                "key",
                F.lit(1).cast("long").alias("value"),
            )
        )
        assert cold.count() == n_cold
    else:
        cold = spark.createDataFrame(
            [("2024-01-01 00:00:00", "celeb", 1)], "ts string, key string, value long"
        ).select(F.col("ts").cast("timestamp"), "key", "value")
    hot = spark.range(n_hot).select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id") % 86_000)).alias("ts"),
        F.lit("celeb").alias("key"),
        (F.col("id") % 1000 - 500).alias("value"),
    )
    for i, df in enumerate([cold, hot]):
        tmp = os.path.join(ROOT, "__chunk")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        [f] = glob.glob(os.path.join(tmp, "*.parquet"))
        shutil.move(f, os.path.join(out, f"chunk{i}.parquet"))
        shutil.rmtree(tmp)
        # chunk order = mtime order for the file source
        t = time.time() + i
        os.utime(os.path.join(out, f"chunk{i}.parquet"), (t, t))
    return out


def run_shared(spark, src_dir: str, semigroup: str, key_buckets: int) -> dict:
    """2-trigger run (maxFilesPerTrigger=1); returns the HOT trigger's
    stateful update time + end-state size."""
    import summingbird_spark as sb
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    schema = "ts timestamp, key string, value long"
    src = stream_source(src_dir, schema, time_col="ts",
                        max_files_per_trigger=1)
    p = src.sum_by_key("key", "value", semigroup=semigroup,
                       batcher=sb.of_days(1))
    plan = StreamPlanner(spark, summer_key_buckets=key_buckets).plan(p)
    work = tempfile.mkdtemp(prefix="sbspark-hotkey-")
    t0 = time.perf_counter()
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save(),
        checkpoint=f"{work}/ckpt",
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    hot = {}
    for pr in q.recentProgress:
        if pr.get("numInputRows", 0) > 100_000:  # the hot trigger
            op = (pr.get("stateOperators") or [{}])[0]
            hot = {
                "update_ms": op.get("allUpdatesTimeMs"),
                "commit_ms": op.get("commitTimeMs"),
                "state_rows": op.get("numRowsTotal"),
                "state_bytes": op.get("memoryUsedBytes"),
            }
    shutil.rmtree(work, ignore_errors=True)
    hot["wall_sec"] = wall
    return hot


def main_shared() -> None:
    """--shared: the celebrity key in a POPULATED bucket (VERDICT r13
    item 4). The r13 probe isolated the hot key in its own bucket; the
    100-TB shape is a viral key hashed into a bucket with ~10^3 cold
    keys, where the hot trigger re-serializes the whole bucket dict (the
    measured write-amplification tax) and the groupby must not degrade.
    Reference anchor: KeyValueShards.summerIdFor = hash(k) % shards
    (online/executor/FinalFlatMap.scala:49-52) — same collision shape."""
    from pyspark.sql import SparkSession

    n_hot, n_cold, kb = 1_000_000, 1_000, 8
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"hot={n_hot} rows on 1 key; shared bucket holds {n_cold} cold "
          f"keys; key_buckets={kb}", flush=True)
    print("| semigroup | bucket | hot-trigger update ms | commit ms "
          "| state rows | state bytes |")
    print("|---|---|---|---|---|---|")
    for sg in ["sum_long", "moments"]:
        res = {}
        for tag, nc in [("isolated", 0), ("shared", n_cold)]:
            src = make_shared_bucket_corpus(spark, n_hot, nc, kb)
            r = run_shared(spark, src, sg, kb)   # warm
            r = run_shared(spark, src, sg, kb)
            res[tag] = r
            print(f"| {sg} | {tag} | {r['update_ms']} | {r['commit_ms']} "
                  f"| {r['state_rows']} | {r['state_bytes']} |", flush=True)
        if res["isolated"].get("update_ms") and res["shared"].get("update_ms"):
            amp = res["shared"]["update_ms"] / max(1, res["isolated"]["update_ms"])
            print(f"# {sg}: shared/isolated hot-trigger update ratio = "
                  f"{amp:.2f}x", flush=True)
    spark.stop()


def main() -> None:
    from pyspark.sql import SparkSession

    if "--shared" in sys.argv:
        return main_shared()

    sizes = [int(x) for x in sys.argv[1:]] or [10_000, 1_000_000]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # codegen warmup

    rows = []
    for sg in ["sum_long", "avg", "moments", "qsketch"]:
        for n in sizes:
            src = make_corpus(spark, n)
            r = run_one(spark, src, sg)  # warm the file-source/codegen
            r = run_one(spark, src, sg)
            rows.append((sg, n, r))
            print(f"{sg:9s} n={n:>8d}  wall={r['wall_sec']:.2f}s  "
                  f"update={r['update_ms']}ms  state_rows={r['state_rows']}  "
                  f"state_bytes={r['state_bytes']}", flush=True)

    print()
    print("| semigroup | rows (1 key) | wall s | update ms | state rows | state bytes |")
    print("|---|---|---|---|---|---|")
    for sg, n, r in rows:
        print(f"| {sg} | {n} | {r['wall_sec']:.2f} | {r['update_ms']} "
              f"| {r['state_rows']} | {r['state_bytes']} |")
    for sg in ["sum_long", "avg", "moments", "qsketch"]:
        sub = [(n, r) for s, n, r in rows if s == sg]
        if len(sub) >= 2 and sub[0][1]["update_ms"] and sub[-1][1]["update_ms"]:
            ratio = sub[-1][1]["update_ms"] / max(1, sub[0][1]["update_ms"])
            print(f"# {sg}: update-time ratio at {sub[-1][0] // sub[0][0]}x "
                  f"rows = {ratio:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
