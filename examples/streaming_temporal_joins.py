"""Streaming temporal joins — the online service-join family end to end
(reference: online grouped leftJoin, OnlinePlan.scala:86-92; loop join
ScaldingPlatform.scala:430-469; LookupJoin.rightSumming :402-428):

  1. stage a TIME-ORDERED 3-chunk file-stream replay of the events table
     (range-partition by ts + mtime order — the shape a deployment's
     date-partitioned event log already has)
  2. streaming LOOP join: each purchase left-joins the store fed by its
     own stream's summer — the per-user running total of PRIOR purchase
     cents, state carried across micro-batches
  3. streaming AS-OF join: each purchase enriched with the same user's
     latest click value as of the purchase's event time
  4. parity check: the loop join's final per-user state equals the batch
     planner's answer over the same rows

Run:
    python examples/streaming_temporal_joins.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stage_time_ordered(spark, sf_dir: str) -> tuple[str, object]:
    """3 contiguous ts-range chunks with strictly increasing mtimes, so a
    maxFilesPerTrigger=1 file stream replays them oldest-first."""
    from summingbird_spark.sources.replay import stage_time_ordered_replay
    from summingbird_spark.sources.tables import load_table

    src = tempfile.mkdtemp(prefix="sbspark-example-stream-")
    events = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_id", "event_type", "value"
    )
    stage_time_ordered_replay(events, src, time_col="ts", n_chunks=3)
    return src, spark.read.parquet(src).schema


def main(sf_dir: str) -> None:
    import summingbird_spark as sb
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source
    from summingbird_spark.streaming.temporal import streaming_as_of_join

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("streaming-temporal-joins")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    src_dir, schema = stage_time_ordered(spark, sf_dir)

    # -- 2. streaming loop join through the DSL ---------------------------
    cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    svc = sb.StoreService(value=cents, semigroup="sum_long",
                          out_col="prior_cents", order_by=["event_id"])
    p = (
        stream_source(src_dir, schema, time_col="ts", max_files_per_trigger=1)
        .filter("event_type = 'purchase'")
        .left_join(svc, on="user_id")
    )
    plan = StreamPlanner(spark).plan(p)
    q = plan.start_to_memory(spark, "loop_out")
    q.awaitTermination(180)
    loop = spark.sql(
        "SELECT user_id, event_id, prior_cents FROM loop_out"
    ).cache()
    print("== streaming loop join (each purchase sees PRIOR purchases) ==")
    loop.orderBy(F.desc("prior_cents")).show(5)

    # -- 3. streaming as-of enrichment ------------------------------------
    def rd():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src_dir))

    left = rd().where("event_type = 'purchase'").select("ts", "user_id", "event_id")
    right = rd().where("event_type = 'click'").select(
        "user_id", F.col("ts").alias("rts"), F.col("value").alias("last_click"))
    asof = streaming_as_of_join(
        left, right, on="user_id", left_time="ts", right_time="rts",
        value_cols=["last_click"], mode="latest",
    )
    q2 = (asof.writeStream.format("memory").queryName("asof_out")
          .outputMode("update").trigger(availableNow=True).start())
    q2.awaitTermination(180)
    print("== streaming as-of (latest click value at purchase time) ==")
    spark.sql(
        "SELECT user_id, event_id, last_click FROM asof_out "
        "WHERE last_click IS NOT NULL"
    ).show(5)

    # -- 4. parity: streamed loop join == batch loop join ------------------
    from summingbird_spark import source, to_dataframe
    from summingbird_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bp = (
        source(ev, time_col="ts")
        .filter("event_type = 'purchase'")
        .left_join(svc, on="user_id")
    )
    batch = to_dataframe(spark, bp).select("event_id", F.col("prior_cents").alias("b"))
    diff = (loop.join(batch, "event_id")
            .where(F.coalesce(F.col("prior_cents"), F.lit(-1))
                   != F.coalesce(F.col("b"), F.lit(-1))).count())
    n = loop.count()
    print(f"parity: {n} purchases, {diff} mismatches vs the batch planner")
    assert diff == 0
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
