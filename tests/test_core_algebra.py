"""Differential tests of the core Producer algebra against plain-Python
oracles — the reference's TestGraphs/MemoryLaws methodology (SURVEY §5):
same dataflow in the DSL and in driver-side Python over the same rows.
"""

import datetime as dt
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark import source, to_dataframe


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (ts(i), f"k{i % 5}", i, f"w{i % 3} w{i % 7}")
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "ts timestamp, key string, value long, text string")


def rows_of(events):
    return [(ts(i), f"k{i % 5}", i, f"w{i % 3} w{i % 7}") for i in range(100)]


def test_map_filter(spark, events):
    p = (
        source(events, time_col="ts")
        .filter("value % 2 = 0")
        .map(doubled=F.col("value") * 2)
        .select("key", "doubled")
    )
    got = sorted((r.key, r.doubled) for r in to_dataframe(spark, p).collect())
    want = sorted((k, v * 2) for _, k, v, _ in rows_of(events) if v % 2 == 0)
    assert got == want


def test_flat_map_wordcount_single_step(spark, events):
    """singleStepJob (TestGraphs.scala:120-135): flatMap → sumByKey."""
    p = (
        source(events, time_col="ts")
        .flat_map(F.split("text", " "), alias="word")
        .sum_by_key("word", F.lit(1), semigroup="count")
        .snapshot()
    )
    got = {r.word: r.value for r in to_dataframe(spark, p).collect()}
    oracle = Counter(w for *_, t in rows_of(events) for w in t.split(" "))
    assert got == dict(oracle)


def test_merge_union_all(spark, events):
    a = source(events, time_col="ts").filter("value < 10")
    b = source(events, time_col="ts").filter("value < 5")
    got = to_dataframe(spark, a.merge(b)).count()
    assert got == 10 + 5  # bag union, no dedup


def test_either_tags(spark, events):
    a = source(events, time_col="ts").filter("value < 3")
    b = source(events, time_col="ts").filter("value >= 97")
    df = to_dataframe(spark, a.either(b))
    got = Counter(r["__side__"] for r in df.collect())
    assert got == Counter({"L": 3, "R": 3})


def test_left_join_service(spark, events):
    """leftJoinJob (TestGraphs.scala:174-192)."""
    dim = spark.createDataFrame(
        [("k0", "zero"), ("k1", "one"), ("k9", "nine")], "key string, label string"
    )
    p = source(events, time_col="ts").left_join(sb.Service(dim), on="key")
    rows = to_dataframe(spark, p).collect()
    lut = {"k0": "zero", "k1": "one"}
    for r in rows:
        assert r.label == lut.get(r.key)  # None where no match
    assert len(rows) == 100


def test_sum_by_key_prev_delta(spark, events):
    """Summer emits (Option[prev], delta) per key-batch
    (Producer.scala:412-420)."""
    batcher = sb.of_minutes(30)
    p = source(events, time_col="ts").sum_by_key(
        "key", "value", semigroup="sum", batcher=batcher
    )
    rows = to_dataframe(spark, p).collect()
    # python oracle
    per = defaultdict(lambda: defaultdict(int))
    for t, k, v, _ in rows_of(events):
        per[k][int(t.timestamp() * 1000) // (30 * 60_000)] += v
    for r in rows:
        batches = per[r.key]
        assert r.delta == batches[r.batch_id]
        prior = [batches[b] for b in batches if b < r.batch_id]
        assert r.prev == (sum(prior) if prior else None)
    assert len(rows) == sum(len(v) for v in per.values())


def test_sum_by_key_noncommutative_concat(spark):
    """Non-commutative semigroup: time-ordered fold
    (BatchedStore.scala:199-203). Insert rows shuffled; result must be
    time-ordered."""
    rows = [(ts(i), "k", chr(ord("a") + i % 26)) for i in range(40)]
    import random

    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(
        rows, "ts timestamp, key string, value string"
    ).repartition(8)
    p = source(df, time_col="ts").sum_by_key(
        "key", "value", semigroup="concat", batcher=sb.of_minutes(10)
    )
    got = {r.batch_id: (r.prev, r.delta) for r in to_dataframe(spark, p).collect()}
    ordered = [chr(ord("a") + i % 26) for i in range(40)]
    assert got[min(got)][1] == "".join(ordered[:10])
    # full reconstruction: concat of prev+delta at max batch == full ordered string
    last = max(got)
    assert got[last][0] + got[last][1] == "".join(ordered)


def test_flat_map_keys_rollup(spark, events):
    """flatMapKeys rollup idiom (ScaldingPlatform.scala:497-531)."""
    p = (
        source(events, time_col="ts")
        .key_by("key")
        .flat_map_keys(F.array(F.col("key"), F.lit("ALL")), alias="rkey")
        .sum_by_key("value")
        .snapshot()
    )
    got = {r.rkey: r.value for r in to_dataframe(spark, p).collect()}
    per = defaultdict(int)
    for _, k, v, _ in rows_of(events):
        per[k] += v
        per["ALL"] += v
    assert got == dict(per)


def test_also_and_write(spark, events):
    sink = sb.MemorySink()
    written = source(events, time_col="ts").filter("value < 7").write(sink)
    main = source(events, time_col="ts").sum_by_key("key", "value").snapshot()
    p = written.also(main)
    df = to_dataframe(spark, p)
    assert df.count() == 5  # 5 keys
    assert len(sink.rows) == 7


def test_diamond_compiles_once(spark, events):
    """diamondJob (TestGraphs.scala:106-118): one source, two branches,
    merged into one summer."""
    src = source(events, time_col="ts")
    left = src.map(value=F.col("value") * 1)
    right = src.map(value=F.col("value") * 10)
    p = left.merge(right).sum_by_key("key", "value").snapshot()
    got = {r.key: r.value for r in to_dataframe(spark, p).collect()}
    per = defaultdict(int)
    for _, k, v, _ in rows_of(events):
        per[k] += v + v * 10
    assert got == dict(per)
