"""Round-17 isolated quiet measurement: min-of-3 noop-sink timings for
the rows this round touches (plus untouched controls), with the same
session shape as bench.py. Usage:

    python scripts/r17_measure.py [row ...]

Defaults to the round's touched set. Prints one JSON line per row and a
summary vs the committed BENCH_QUIET floors."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

TOUCHED = [
    "lambda_avg_by_user",
    "stream_sum_by_key",
    "stream_moments_by_key",
    "stream_quantile_by_key",
    "semantic_dedup",
    "semantic_dedup_partitioned",
    "incremental_semantic_dedup",
    "stream_semantic_dedup",
    "pmi_cooccurrence",
    "embedding_covariance",
    "embedding_lsh_topk",
    "bpe_tokens",
    "dedup_clusters",
    "dedup_survivors",
    # untouched controls (store/other sink families)
    "stream_buffer_join",
    "stream_session_window",
    "stream_dedup",
]


def main() -> None:
    rows = sys.argv[1:] or TOUCHED
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r17-measure")
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

    from summingbird_spark.queries import QUERIES
    from summingbird_spark.sources.tables import load_table

    # bench.py's warmups
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, SF_DIR, "region").count()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    from summingbird_spark.functions.similarity import (
        ensure_ivf_index,
        ensure_lsh_index,
        ensure_quantized_table,
    )

    ensure_ivf_index(spark, SF_DIR, k=32, n_iter=5, sample_fraction=0.5)
    ensure_ivf_index(spark, SF_DIR, k=96, n_iter=4, sample_fraction=0.5)
    ensure_lsh_index(spark, SF_DIR, planes=6, tables=20)
    ensure_quantized_table(spark, SF_DIR)
    # stream warmup
    import shutil
    import tempfile

    warm = tempfile.mkdtemp(prefix="r17-warm-")
    spark.createDataFrame([("k", 1.0)], "key string, value double").coalesce(
        1
    ).write.parquet(f"{warm}/src")
    wq = (
        spark.readStream.schema("key string, value double")
        .parquet(f"{warm}/src")
        .groupBy("key")
        .count()
        .writeStream.format("noop")
        .option("checkpointLocation", f"{warm}/ckpt")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination(120)
    shutil.rmtree(warm, ignore_errors=True)

    quiet = {}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "BENCH_QUIET.json")
        ) as f:
            quiet = json.load(f).get("queries_min3", {})
    except OSError:
        pass

    out = {}
    for name in rows:
        fn = QUERIES[name]
        times = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"r17 {name} run{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        mn = min(times)
        base = quiet.get(name)
        delta = round(mn - base, 3) if base is not None else None
        out[name] = mn
        print(
            json.dumps(
                {
                    "row": name,
                    "times": times,
                    "min": mn,
                    "quiet_floor": base,
                    "delta_vs_floor": delta,
                }
            ),
            flush=True,
        )
    print(json.dumps({"summary_min_total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
