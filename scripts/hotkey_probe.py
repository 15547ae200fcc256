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


def main() -> None:
    from pyspark.sql import SparkSession

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
