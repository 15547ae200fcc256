"""Checkpoint state lifecycle on the test data: observe a live summer
checkpoint, get a measured re-size recommendation, and migrate to a new
bucket count WITHOUT replaying the old corpus.

    python examples/state_migration.py [workdir]

Steps:
 1. generation A: stream the first half of the events table through the
    stateful summer (auto-sized buckets, layout pinned per checkpoint);
 2. observe: decode the live state (`read_summer_state`) and audit
    per-bucket bytes/keys (`state_skew_report`); `suggest_key_buckets`
    turns the measured residency into a recommended count;
 3. show the guard: re-planning at a different count against the SAME
    checkpoint refuses loudly (no silent wrong-bucket merges);
 4. migrate: `export_summer_bootstrap` re-routes every in-flight
    (key, BatchID) total under the new count; generation B starts a
    FRESH checkpoint over ONLY the second half, seeded from the export;
 5. verify: generation B's final state equals a one-shot aggregation
    over BOTH halves — prev continued exactly, zero replay.
"""

import os
import pickle
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark.sources.tables import load_table
from summingbird_spark.streaming.planner import StreamPlanner, stream_source
from summingbird_spark.streaming.state_tools import (
    export_summer_bootstrap,
    read_summer_state,
    state_skew_report,
    suggest_key_buckets,
)

SF_DIR = "/root/testdata/sf0.001"
CUTOFF = "2024-01-21"
SCHEMA = "user_id bigint, ts timestamp, value double"


def main(workdir: str) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("state-migration")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    batcher = sb.of_days(1)
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", F.coalesce(F.col("value"), F.lit(0.0)).alias("value")
    )
    for name, pred in [("a", F.col("ts") < CUTOFF),
                       ("b", F.col("ts") >= CUTOFF)]:
        path = f"{workdir}/{name}/src"
        if not os.path.exists(path):
            ev.where(pred).coalesce(2).write.parquet(path)

    def pipe(srcdir):
        s = stream_source(srcdir, SCHEMA, time_col="ts")
        return s.sum_by_key("user_id", "value", semigroup="sum",
                            batcher=batcher)

    sink = lambda bdf, bid: bdf.write.format("noop").mode("overwrite").save()

    # 1. generation A (auto-sized; the checkpoint pins the layout)
    pl_a = StreamPlanner(spark)  # summer_key_buckets='auto' default
    plan_a = pl_a.plan(pipe(f"{workdir}/a/src"))
    q = plan_a.start_foreach_batch(sink, checkpoint=f"{workdir}/ck_a")
    q.awaitTermination(240)
    kb_a = pl_a.last_auto_key_buckets
    print(f"generation A ran at {kb_a} buckets")

    # 2. observe the live checkpoint
    n_cells = read_summer_state(
        spark, f"{workdir}/ck_a", "user_id bigint", value_type="double"
    ).count()
    rec = suggest_key_buckets(spark, f"{workdir}/ck_a")
    print(f"in-flight cells: {n_cells}; residency: {rec}")

    # 3. the layout guard: a different count on the SAME checkpoint refuses
    new_kb = max(rec["suggested_buckets"], kb_a + 1)  # force a change
    try:
        StreamPlanner(spark, summer_key_buckets=new_kb).plan(
            pipe(f"{workdir}/a/src")
        ).start_foreach_batch(sink, checkpoint=f"{workdir}/ck_a")
        raise SystemExit("guard failed to refuse")
    except ValueError as e:
        print(f"guard refused the re-size in place: {str(e)[:60]}...")

    # 4. migrate: export under the new count, start gen B seeded
    n_exp = export_summer_bootstrap(
        spark, f"{workdir}/ck_a", f"{workdir}/boot", "user_id bigint",
        new_key_buckets=new_kb,
    )
    print(f"exported {n_exp} cells re-routed to {new_kb} buckets")

    # 4b. the export pinned ITS layout too (_manifest.json): starting the
    # new generation at any OTHER count is refused at plan() — a mismatch
    # would seed each key only where both hashes coincide (r15 guard)
    from summingbird_spark.streaming.state_tools import (
        read_bootstrap_manifest,
    )

    m = read_bootstrap_manifest(spark, f"{workdir}/boot")
    assert m["new_key_buckets"] == new_kb and m["cells"] == n_exp
    try:
        StreamPlanner(
            spark, summer_key_buckets=new_kb + 1,
            summer_bootstrap_dir=f"{workdir}/boot",
        ).plan(pipe(f"{workdir}/b/src"))
        raise SystemExit("manifest guard failed to refuse")
    except ValueError as e:
        print(f"manifest refused the mismatched count: {str(e)[:60]}...")

    plan_b = StreamPlanner(
        spark, summer_key_buckets=new_kb,
        summer_bootstrap_dir=f"{workdir}/boot",
    ).plan(pipe(f"{workdir}/b/src"))
    q = plan_b.start_foreach_batch(sink, checkpoint=f"{workdir}/ck_b")
    q.awaitTermination(240)

    # 5. verify: gen-B state (+ carried cells in never-touched buckets)
    # equals the one-shot aggregation over the WHOLE table
    got = {
        (r.user_id, r.batch_id): round(r.value, 9)
        for r in read_summer_state(
            spark, f"{workdir}/ck_b", "user_id bigint", value_type="double"
        ).collect()
    }
    for r in spark.read.parquet(f"{workdir}/boot").collect():
        kt, b = pickle.loads(bytes(r.cell))
        got.setdefault((kt[0], b), round(pickle.loads(bytes(r.total)), 9))
    want = {
        (r.user_id, r.batch_id): round(r.value, 9)
        for r in ev.groupBy(
            "user_id", batcher.batch_col(F.col("ts")).alias("batch_id")
        ).agg(F.sum("value").alias("value")).collect()
    }
    ok = got == want
    print(f"migrated state matches one-shot truth: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    raise SystemExit(main(workdir))
