"""Hybrid (lambda) wordcount end-to-end on the test data — the reference's
whole value proposition in one script: ONE logical pipeline runs as an
incremental batch job AND as a stream, and serving merges both.

    python examples/hybrid_wordcount.py [workdir]

Steps:
 1. split the events table into "history" (first 20 days) and "tail";
 2. batch path: rollforward the history into a versioned snapshot store
    with the commit ledger;
 3. streaming path: feed the tail through the streaming planner's stateful
    summer into the online store (micro-batched);
 4. serving: client_view(offline ⊕ online) — and check it equals the
    one-shot aggregation over all events.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark.batch.state import CheckpointState, run_batch_job
from summingbird_spark.client.merge import client_view
from summingbird_spark.sources.tables import load_table
from summingbird_spark.streaming.planner import StreamPlanner, stream_source
from summingbird_spark.streaming.store import OnlineStore, run_summer_to_store

SF_DIR = "/root/testdata/sf0.001"
CUTOFF = "2024-01-21"


def main(workdir: str) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hybrid-wordcount")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    batcher = sb.of_days(1)
    ev = load_table(spark, SF_DIR, "events")

    # 1. history / tail split; the tail lands as files (a stream source)
    # stream sources are append-only: never rewrite files under a
    # checkpointed stream (new file names would re-ingest as new data)
    tail_dir = f"{workdir}/tail"
    if not os.path.exists(tail_dir):
        ev.where(F.col("ts") >= CUTOFF).coalesce(2).write.parquet(tail_dir)

    # 2. batch path over history with the commit ledger
    store = sb.VersionedBatchStore(f"{workdir}/offline", ["user_id"], "sum_long")
    state = CheckpointState(f"{workdir}/state")
    import datetime as dt

    b_cut = batcher.batch_of(dt.datetime.fromisoformat(CUTOFF)) - 1
    history = ev.where(F.col("ts") < CUTOFF).withColumn(
        sb.TIME_COL, F.col("ts")
    ).withColumn("value", F.lit(1).cast("long"))
    from summingbird_spark.batch.state import StateError

    try:
        run_batch_job(spark, store, history, batcher, b_cut, state)
    except StateError:
        print("offline interval already committed — reusing the snapshot")
    print(f"offline committed through batch {state.committed_through()}")

    # 3. streaming path over the tail
    src = stream_source(tail_dir, ev.schema.simpleString().replace("struct<", "").rstrip(">").replace(":", " "), time_col="ts", max_files_per_trigger=1)
    pipeline = src.sum_by_key("user_id", F.lit(1).cast("long"), semigroup="sum_long", batcher=batcher)
    plan = StreamPlanner(spark).plan(pipeline)
    online = OnlineStore(f"{workdir}/online", ["user_id"], "sum_long")
    run_summer_to_store(plan.dataframe, online, f"{workdir}/ckpt").awaitTermination(120)
    print(f"online store holds {online.read(spark).count()} (user, batch) rows")

    # 4. serving merge == one-shot truth
    merged = client_view(
        store.read_last(spark)[1],
        online.read(spark).select("user_id", "batch_id", "value"),
        ["user_id"],
        semigroup="sum_long",
        offline_batch=b_cut,
    )
    got = {r.user_id: r.value for r in merged.collect()}
    truth = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ok = got == truth
    print(f"serving view rows: {len(got)}; matches one-shot truth: {ok}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="hybrid_wc_")
    rc = main(wd)
    print(f"workdir: {wd}")
    sys.exit(rc)
