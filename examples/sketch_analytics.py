"""Sketch-algebra analytics — the round-6 algebird-parity monoids composed
into one runnable report over the events table, all from the public API:

  1. Moments per user (mergeable power sums → mean/var/skew/kurtosis)
  2. Count-Min Sketch per event_type (relational sketch_table build),
     probed for the top exact users as a sanity readout
  3. Bloom filter of high-value users per type (bitset_table build) +
     membership probe
  4. HLL distinct users and top-10 values per type via sumByKey — the
     same Summer machinery every sketch flows through

Every value here is a SEMIGROUP: it merges across batches in a store
rollforward and across triggers in the streaming summer exactly like a
plain sum.

Run:
    python examples/sketch_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sketch-analytics")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import summingbird_spark as sb
    from summingbird_spark import source, to_dataframe
    from summingbird_spark.core.semigroup import MomentsSemigroup, get
    from summingbird_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    src = source(lambda s: load_table(s, sf_dir, "events"), time_col="ts")

    # 1. moments per user through the DSL Summer
    p = src.sum_by_key("user_id", "value", semigroup="moments").snapshot()
    pres = MomentsSemigroup.present(F.col("value"))
    moments = to_dataframe(spark, p).select(
        "user_id",
        F.col("value")["n"].alias("n"),
        F.round(pres["mean"], 3).alias("mean"),
        F.round(pres["var_pop"], 3).alias("var"),
        F.round(pres["skew"], 3).alias("skew"),
    )
    print("-- per-user moments (5 rows) --")
    moments.orderBy("user_id").show(5, truncate=False)

    # 2. CMS per event_type, probed for the 3 most frequent users
    cms = get("cms64x4")
    sketches = cms.sketch_table(
        ev.withColumn("__u__", F.col("user_id").cast("string")),
        "event_type", "__u__",
    )
    top = (
        ev.groupBy("event_type", "user_id")
        .count()
        .withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("event_type")
                .orderBy(F.desc("count"), "user_id")
            ),
        )
        .where("rk <= 3")
    )
    probe = top.join(sketches, "event_type").select(
        "event_type", "user_id", F.col("count").alias("exact"),
        cms.estimate(F.col("sketch"), F.col("user_id").cast("string")).alias("cms_est"),
    )
    print("-- CMS estimates vs exact (top-3 users per type) --")
    probe.orderBy("event_type", F.desc("exact")).show(9, truncate=False)

    # 3. Bloom membership of high-value users
    bf = get("bloom1024x3")
    members = (
        ev.where("value > 95")
        .select("event_type", F.col("user_id").cast("string").alias("__u__"))
        .distinct()
    )
    blooms = bf.bitset_table(members, "event_type", "__u__")
    hit = members.join(blooms, "event_type").select(
        "event_type", bf.might_contain(F.col("bitset"), F.col("__u__")).alias("hit")
    )
    print("-- bloom: member hit-rate per type (must be 1.0) --")
    hit.groupBy("event_type").agg(F.avg(F.col("hit").cast("double")).alias("hit_rate")).show()

    # 4. HLL distinct + top-10 values, same Summer machinery
    hll = src.sum_by_key("event_type", "user_id", semigroup="hll").snapshot()
    from summingbird_spark.core.semigroup import HllSemigroup

    print("-- HLL distinct users per type --")
    to_dataframe(spark, hll).select(
        "event_type", HllSemigroup.estimate(F.col("value")).alias("approx_users")
    ).orderBy("event_type").show()

    # 5. mergeable quantiles (QTree idiom): p50/p95 of value per type
    from summingbird_spark.core.semigroup import QuantileSketchSemigroup

    qs = QuantileSketchSemigroup(0.0, 1024.0, 1024)
    qsk = qs.histogram_table(ev, "event_type", "value")
    print("-- quantile sketch: p50 / p95 of value per type (±1.0) --")
    qsk.select(
        "event_type",
        F.round(qs.quantile(F.col("sketch"), 0.5), 1).alias("p50"),
        F.round(qs.quantile(F.col("sketch"), 0.95), 1).alias("p95"),
    ).orderBy("event_type").show()

    # 6. mergeable heavy hitters (Misra-Gries): dominant value-magnitude
    # buckets per type, built per month and MERGED like a store would
    from summingbird_spark.core.semigroup import MisraGriesSemigroup

    mg = MisraGriesSemigroup(8)
    monthly = mg.summary_table(
        ev.withColumn("__m__", F.date_trunc("month", "ts")).withColumn(
            "__b__", F.floor(F.sqrt(F.col("value"))).cast("int")
        ),
        ["event_type", "__m__"],
        "__b__",
    )
    merged = monthly.groupBy("event_type").agg(
        mg.agg_carrier(F.col("summary")).alias("summary")
    )
    print("-- heavy value buckets per type (bucket i = value in [i², (i+1)²)) --")
    merged.select(
        "event_type",
        F.slice(
            F.array_sort(
                F.map_entries("summary"),
                lambda x, y: F.when(x["value"] < y["value"], 1)
                .when(x["value"] > y["value"], -1)
                .otherwise(0),
            ),
            1,
            3,
        ).alias("top3_buckets"),
    ).orderBy("event_type").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
