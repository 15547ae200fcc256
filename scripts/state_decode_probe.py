"""State-decode scale probe: does ``read_summer_state`` /
``export_summer_bootstrap`` hold its "decodes at scan parallelism, no
driver collect" claim as resident state grows 10×?

Builds two bucketed summer checkpoints (auto-sized layouts) from
generated corpora at 1× and 10× key counts, then measures the wall time
of (a) a full logical-state decode (count over read_summer_state), (b)
the skew-report aggregate, and (c) a bootstrap export re-routed to a
different bucket count — plus driver RSS. Healthy shape: wall tracks
resident cells ≈ linearly (exponent ≤ ~1 on the 1×→10× decade, fixed
job overhead makes it sublinear), RSS flat.

Usage: python scripts/state_decode_probe.py [keys1 keys2]
       (default 15000 150000)
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/sbspark-state-decode"


def build_checkpoint(spark, n_keys: int) -> str:
    from pyspark.sql import functions as F

    import summingbird_spark as sb
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    src = os.path.join(ROOT, f"src_{n_keys}")
    ckpt = os.path.join(ROOT, f"ck_{n_keys}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        (
            spark.range(n_keys * 10)
            .select(
                (
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(days=(F.col("id") % 3).cast("int"))
                ).alias("ts"),
                F.concat(F.lit("user"), F.col("id") % n_keys).alias("key"),
                (F.col("id") % 97).alias("value"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(src)
        )
    if os.path.exists(ckpt):
        return ckpt
    s = stream_source(src, "ts timestamp, key string, value long",
                      time_col="ts")
    p = s.sum_by_key("key", "value", semigroup="sum_long",
                     batcher=sb.of_days(1))
    plan = StreamPlanner(spark).plan(p)
    q = plan.start_foreach_batch(
        lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save(),
        checkpoint=ckpt,
    )
    q.awaitTermination(600)
    return ckpt


def measure(spark, ckpt: str, n_keys: int) -> dict:
    from summingbird_spark.streaming.state_tools import (
        export_summer_bootstrap,
        read_summer_state,
        state_skew_report,
    )

    t0 = time.perf_counter()
    cells = read_summer_state(spark, ckpt, "key string",
                              value_type="bigint").count()
    t_decode = time.perf_counter() - t0
    t0 = time.perf_counter()
    state_skew_report(spark, ckpt).agg({"state_bytes": "sum"}).collect()
    t_skew = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_exp = export_summer_bootstrap(
        spark, ckpt, os.path.join(ROOT, f"boot_{n_keys}"), "key string",
        new_key_buckets=max(8, n_keys // 50),
    )
    t_export = time.perf_counter() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    return {
        "cells": cells,
        "decode_sec": round(t_decode, 2),
        "skew_sec": round(t_skew, 2),
        "export_sec": round(t_export, 2),
        "exported": n_exp,
        "driver_rss_mb": round(rss_mb, 0),
    }


def main() -> None:
    from pyspark.sql import SparkSession

    sizes = [int(x) for x in sys.argv[1:]] or [15_000, 150_000]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for n in sizes:
        ckpt = build_checkpoint(spark, n)
        measure(spark, ckpt, n)  # warm
        r = measure(spark, ckpt, n)
        rows.append((n, r))
        print(f"keys={n:>7d} {r}", flush=True)

    print()
    print("| resident keys | cells | decode s | skew s | export s | driver RSS MiB |")
    print("|---|---|---|---|---|---|")
    for n, r in rows:
        print(f"| {n} | {r['cells']} | {r['decode_sec']} | {r['skew_sec']} "
              f"| {r['export_sec']} | {r['driver_rss_mb']} |")
    if len(rows) == 2:
        import math

        for k in ("decode_sec", "skew_sec", "export_sec"):
            a, b = rows[0][1][k], rows[1][1][k]
            if a > 0 and b > 0:
                exp = math.log(b / a) / math.log(
                    rows[1][1]["cells"] / max(1, rows[0][1]["cells"])
                )
                print(f"# {k}: exponent over the decade = {exp:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
