"""The reference's TestGraphs scenario suite, ported as differential tests
(summingbird-core-test/.../TestGraphs.scala — each xJob DAG vs its
xInScala oracle, SURVEY §5): every scenario runs the DSL through the batch
planner and compares against a plain-Python fold over the same rows.
"""

import datetime as dt
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark import source, to_dataframe


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


N = 120
ROWS = [(ts(i), i, f"w{i % 7} w{i % 11} x{i % 5}") for i in range(N)]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, "ts timestamp, n long, text string")


def snapshot_dict(spark, summer, key):
    df = to_dataframe(spark, summer.snapshot())
    return {r[key]: r["value"] for r in df.collect()}


def test_single_step_job(spark, events):
    """singleStepJob (TestGraphs.scala:120-135): flatMap → sumByKey."""
    p = (
        source(events, time_col="ts")
        .flat_map(F.split("text", " "), alias="word")
        .sum_by_key("word", F.lit(1), semigroup="sum_long")
    )
    got = snapshot_dict(spark, p, "word")
    oracle = defaultdict(int)
    for _, _, t in ROWS:
        for w in t.split(" "):
            oracle[w] += 1
    assert got == dict(oracle)


def test_twin_step_option_map_flat_map_job(spark, events):
    """twinStepOptionMapFlatMapJob (TestGraphs.scala:135-146):
    optionMap → flatMap → sumByKey."""
    p = (
        source(events, time_col="ts")
        .option_map("n % 2 = 0", half=F.col("n") / 2)
        .flat_map(F.array(F.col("half"), F.col("half") + 1), alias="k")
        .sum_by_key("k", F.lit(1), semigroup="sum_long")
    )
    got = snapshot_dict(spark, p, "k")
    oracle = defaultdict(int)
    for _, n, _ in ROWS:
        if n % 2 == 0:
            for k in (n / 2, n / 2 + 1):
                oracle[k] += 1
    assert got == dict(oracle)


def test_single_step_map_keys_job(spark, events):
    """singleStepMapKeysJob (TestGraphs.scala:146-161)."""
    p = (
        source(events, time_col="ts")
        .flat_map(F.split("text", " "), alias="word")
        .key_by("word")
        .map_keys(kk=F.upper(F.col("word")))
        .sum_by_key(F.lit(1), semigroup="sum_long")
    )
    got = snapshot_dict(spark, p, "kk")
    oracle = defaultdict(int)
    for _, _, t in ROWS:
        for w in t.split(" "):
            oracle[w.upper()] += 1
    assert got == dict(oracle)


def test_repeated_tuple_left_join_job(spark, events):
    """repeatedTupleLeftJoinJob (TestGraphs.scala:161-174): the same tuple
    key joined repeatedly — join duplication must not double-count."""
    dim = spark.createDataFrame(
        [(f"w{i}", i * 100) for i in range(4)], "word string, bonus long"
    )
    p = (
        source(events, time_col="ts")
        .flat_map(F.split("text", " "), alias="word")
        .left_join(sb.Service(dim), on="word")
        .left_join(sb.Service(dim.withColumnRenamed("bonus", "bonus2")), on="word")
        .sum_by_key("word", F.coalesce("bonus", F.lit(0)) + F.coalesce("bonus2", F.lit(0)), semigroup="sum_long")
    )
    got = snapshot_dict(spark, p, "word")
    lut = {f"w{i}": i * 100 for i in range(4)}
    oracle = defaultdict(int)
    for _, _, t in ROWS:
        for w in t.split(" "):
            oracle[w] += 2 * lut.get(w, 0)
    assert got == dict(oracle)


def test_left_join_with_flat_map_values_job(spark, events):
    """leftJoinJobWithFlatMapValues (TestGraphs.scala:202-214)."""
    dim = spark.createDataFrame(
        [(f"w{i}", f"a{i} b{i}") for i in range(7)], "word string, tags string"
    )
    k = (
        source(events, time_col="ts")
        .flat_map(F.split("text", " "), alias="word")
        .key_by("word")
        .left_join(sb.Service(dim))
        .flat_map_values(F.split(F.coalesce("tags", F.lit("none")), " "), alias="tag")
    )
    p = k.producer.sum_by_key("tag", F.lit(1), semigroup="sum_long")
    got = snapshot_dict(spark, p, "tag")
    lut = {f"w{i}": f"a{i} b{i}" for i in range(7)}
    oracle = defaultdict(int)
    for _, _, t in ROWS:
        for w in t.split(" "):
            for tag in lut.get(w, "none").split(" "):
                oracle[tag] += 1
    assert got == dict(oracle)


def test_map_only_job(spark, events):
    """mapOnlyJob (TestGraphs.scala:458-465): no summer, just transforms."""
    p = source(events, time_col="ts").map(sq=F.col("n") * F.col("n")).select("sq")
    got = sorted(r.sq for r in to_dataframe(spark, p).collect())
    assert got == sorted(n * n for _, n, _ in ROWS)


def test_lookup_job(spark, events):
    """lookupJob (TestGraphs.scala:465-472): lookup sugar."""
    dim = spark.createDataFrame([(i, i * 7) for i in range(50)], "n long, seven long")
    p = source(events, time_col="ts").lookup(sb.Service(dim), on="n")
    rows = to_dataframe(spark, p).collect()
    for r in rows:
        assert r.seven == (r.n * 7 if r.n < 50 else None)


def test_two_sum_by_key(spark, events):
    """twoSumByKey (TestGraphs.scala:472-493): summer feeding a second
    summer through a key transform — the updates() stream re-keyed."""
    first = source(events, time_col="ts").sum_by_key(
        "n", F.lit(1), semigroup="sum_long", batcher=sb.of_minutes(30)
    )
    # re-key the running updates by n % 5 and sum the deltas again
    second = (
        first.updates()
        .map(bucket=F.col("n") % 5)
        .sum_by_key("bucket", "value", semigroup="sum_long")
    )
    got = snapshot_dict(spark, second, "bucket")
    # oracle: first summer emits one update per (n, 30-min batch) whose
    # value is the running count; second sums those running counts
    per = defaultdict(list)
    for t, n, _ in ROWS:
        b = int(t.timestamp() * 1000) // (30 * 60_000)
        per[n].append(b)
    oracle = defaultdict(int)
    for n, batches in per.items():
        run = 0
        for b in sorted(set(batches)):
            run += sum(1 for x in batches if x == b)
            oracle[n % 5] += run
    assert got == dict(oracle)


def test_diamond_job_with_sink(spark, events, tmp_path):
    """diamondJob (TestGraphs.scala:106-118): source → sink write + two
    branches merged into one summer."""
    sink = sb.MemorySink()
    src = source(events, time_col="ts")
    written = src.write(sink)
    left = written.filter("n % 2 = 0").map(v=F.lit(1), k=F.lit("all"))
    right = written.filter("n % 2 = 1").map(v=F.lit(10), k=F.lit("all"))
    p = left.merge(right).sum_by_key("k", "v", semigroup="sum_long", value_alias="v")
    got = to_dataframe(spark, p.snapshot()).collect()
    assert len(sink.rows) == N  # the sink saw every source row exactly once
    assert got[0].value == (N // 2) * 1 + (N // 2) * 10


def test_job_with_stats(spark, events):
    """jobWithStats (TestGraphs.scala:494+): counters on the flow."""
    from summingbird_spark.batch.planner import BatchPlanner

    p = (
        source(events, time_col="ts")
        .observe("origCounter", n=F.count(F.lit(1)))
        .flat_map(F.split("text", " "), alias="word")
        .observe("fmCounter", n=F.count(F.lit(1)))
        .sum_by_key("word", F.lit(1), semigroup="sum_long")
        .snapshot()
    )
    plan = BatchPlanner(spark).plan(p)
    plan.run().collect()
    assert plan.observations["origCounter"].get["n"] == N
    assert plan.observations["fmCounter"].get["n"] == N * 3  # 3 words/row
