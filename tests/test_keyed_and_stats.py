"""Keyed-producer surface (every §2.1 keyed operator) + the Stats/observe
API + streaming Written sinks.
"""

import datetime as dt
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark import source, to_dataframe
from summingbird_spark.batch.planner import BatchPlanner


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


ROWS = [(ts(i), f"k{i % 4}", i, f"u{i % 3}") for i in range(60)]


@pytest.fixture(scope="module")
def kdf(spark):
    return spark.createDataFrame(ROWS, "ts timestamp, key string, value long, user string")


def run(spark, p):
    return to_dataframe(spark, p)


def test_filter_keys_and_values(spark, kdf):
    k = source(kdf, time_col="ts").key_by("key")
    out = run(spark, k.filter_keys("key != 'k0'").filter_values("value % 2 = 0").producer)
    got = sorted((r.key, r.value) for r in out.collect())
    want = sorted((k_, v) for _, k_, v, _ in ROWS if k_ != "k0" and v % 2 == 0)
    assert got == want


def test_map_keys_changes_key_set(spark, kdf):
    k = source(kdf, time_col="ts").key_by("key")
    k2 = k.map_keys(kk=F.upper(F.col("key")))
    assert k2.key_cols == ("kk",)
    out = run(spark, k2.sum_by_key("value").snapshot())
    got = {r.kk: r.value for r in out.collect()}
    per = defaultdict(int)
    for _, k_, v, _ in ROWS:
        per[k_.upper()] += v
    assert got == dict(per)


def test_flat_map_values_explodes(spark, kdf):
    k = source(kdf, time_col="ts").key_by("key")
    k2 = k.flat_map_values(F.array(F.col("value"), F.col("value") * 10), alias="v2")
    out = run(spark, k2.sum_by_key("v2").snapshot())
    got = {r.key: r.value for r in out.collect()}
    per = defaultdict(int)
    for _, k_, v, _ in ROWS:
        per[k_] += v + v * 10
    assert got == dict(per)


def test_collect_keys_partial_function(spark, kdf):
    k = source(kdf, time_col="ts").key_by("key")
    k2 = k.collect_keys("key IN ('k1','k2')", short=F.substring("key", 2, 1))
    out = run(spark, k2.sum_by_key(F.lit(1), semigroup="sum_long").snapshot())
    got = {r.short: r.value for r in out.collect()}
    assert got == {"1": 15, "2": 15}


def test_collect_values_and_swap(spark, kdf):
    k = source(kdf, time_col="ts").key_by("key")
    k2 = k.collect_values("value >= 30", half=F.col("value") / 2)
    out = run(spark, k2.producer)
    assert out.count() == 30
    swapped = k.swap("user")
    assert swapped.key_cols == ("user",)
    out2 = run(spark, swapped.sum_by_key(F.lit(1), semigroup="sum_long").snapshot())
    assert {r.user: r.value for r in out2.collect()} == {"u0": 20, "u1": 20, "u2": 20}


def test_keys_values_projections(spark, kdf):
    k = source(kdf, time_col="ts").key_by("key")
    keys_df = run(spark, k.keys())
    assert set(keys_df.columns) == {"__time__", "key"}
    vals_df = run(spark, k.values("value", "user"))
    assert set(vals_df.columns) == {"__time__", "value", "user"}


def test_observe_stats(spark, kdf):
    """jobWithStats analog: counters as observed aggregates on the flow."""
    p = (
        source(kdf, time_col="ts")
        .observe("input", n_rows=F.count(F.lit(1)), max_v=F.max("value"))
        .filter("value % 2 = 0")
        .observe("kept", n_rows=F.count(F.lit(1)))
        .sum_by_key("key", "value")
        .snapshot()
    )
    plan = BatchPlanner(spark).plan(p)
    plan.run().collect()  # the action materializes the observations
    assert plan.observations["input"].get == {"n_rows": 60, "max_v": 59}
    assert plan.observations["kept"].get["n_rows"] == 30


def test_streaming_written_sink(spark, tmp_path):
    """WrittenProducer in the streaming planner: pass-through + per-trigger
    foreachBatch effect (StormSink analog)."""
    import glob, shutil

    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    d = tmp_path
    (d / "src").mkdir()
    for i, chunk in enumerate([ROWS[:30], ROWS[30:]]):
        spark.createDataFrame(chunk, "ts timestamp, key string, value long, user string") \
            .coalesce(1).write.parquet(str(d / f"w{i}"))
        for f in glob.glob(str(d / f"w{i}" / "*.parquet")):
            shutil.move(f, str(d / "src" / f"c{i}.parquet"))
        shutil.rmtree(str(d / f"w{i}"))

    sink = sb.ParquetSink(str(d / "sink_out"), mode="append")
    src = stream_source(
        str(d / "src"),
        "ts timestamp, key string, value long, user string",
        time_col="ts",
        max_files_per_trigger=1,
    )
    p = src.filter("value % 3 = 0").write(sink)
    plan = StreamPlanner(spark).plan(p)
    qs = plan.start_writes(str(d / "ckpt"))
    for q in qs:
        q.awaitTermination(120)
    got = spark.read.parquet(str(d / "sink_out"))
    assert got.count() == 20  # 60 rows / 3


def test_streaming_observe_counters(spark, tmp_path):
    """Producer.observe through the streaming planner: per-trigger counts
    arrive via StreamingQueryProgress.observedMetrics."""
    import glob, shutil

    from summingbird_spark.streaming.planner import (
        StreamPlanner,
        observed_metrics,
        stream_source,
    )

    (tmp_path / "src").mkdir()
    for i, chunk in enumerate([ROWS[:30], ROWS[30:]]):
        spark.createDataFrame(chunk, "ts timestamp, key string, value long, user string") \
            .coalesce(1).write.parquet(str(tmp_path / f"w{i}"))
        for f in glob.glob(str(tmp_path / f"w{i}" / "*.parquet")):
            shutil.move(f, str(tmp_path / "src" / f"c{i}.parquet"))
        shutil.rmtree(str(tmp_path / f"w{i}"))

    src = stream_source(
        str(tmp_path / "src"),
        "ts timestamp, key string, value long, user string",
        time_col="ts",
        max_files_per_trigger=1,
    )
    p = src.observe("seen", n=F.count(F.lit(1))).filter("value % 2 = 0")
    plan = StreamPlanner(spark).plan(p)
    q = plan.start_to_memory(spark, "obs_out", output_mode="append")
    q.awaitTermination(120)
    per_trigger = observed_metrics(q)["seen"]
    assert sorted(m["n"] for m in per_trigger) == [30, 30]


def test_cumulative_streaming_counters(spark, tmp_path):
    """CumulativeCounters: job-lifetime totals across triggers via a
    StreamingQueryListener (the reference's counters are cumulative, not
    per-trigger)."""
    import glob, shutil

    from summingbird_spark.streaming.planner import (
        CumulativeCounters,
        StreamPlanner,
        stream_source,
    )

    (tmp_path / "src").mkdir()
    for i, chunk in enumerate([ROWS[:20], ROWS[20:45], ROWS[45:]]):
        spark.createDataFrame(chunk, "ts timestamp, key string, value long, user string") \
            .coalesce(1).write.parquet(str(tmp_path / f"w{i}"))
        for f in glob.glob(str(tmp_path / f"w{i}" / "*.parquet")):
            shutil.move(f, str(tmp_path / "src" / f"c{i}.parquet"))
        shutil.rmtree(str(tmp_path / f"w{i}"))

    counters = CumulativeCounters().attach(spark)
    try:
        src = stream_source(
            str(tmp_path / "src"),
            "ts timestamp, key string, value long, user string",
            time_col="ts",
            max_files_per_trigger=1,
        )
        p = src.observe("lifetime", n=F.count(F.lit(1)), v=F.sum("value"))
        q = StreamPlanner(spark).plan(p).start_to_memory(
            spark, "cum_out", output_mode="append"
        )
        q.awaitTermination(120)
        got = counters.wait_for(
            "lifetime", until=lambda t: t.get("n", 0) >= len(ROWS)
        )
        assert got["n"] == len(ROWS)
        assert got["v"] == sum(r[2] for r in ROWS)
    finally:
        counters.detach(spark)


def test_cooccurrence_pairs_hand_computed(spark):
    from summingbird_spark.functions.text import cooccurrence_pairs

    df = spark.createDataFrame([(1, "a b a"), (2, "b")], "doc_id long, text string")
    # window=2 pairs for "a b a": (a,b)@1-2, (b,a)@2-3, (a,a)@1-3
    got = {
        (r["w1"], r["w2"]): r["pair_count"]
        for r in cooccurrence_pairs(df, "doc_id", "text", window=2).collect()
    }
    assert got == {("a", "b"): 2, ("a", "a"): 1}


def test_pmi_matches_python(spark):
    import math

    from summingbird_spark.functions.text import pmi_pairs

    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x z")], "doc_id long, text string"
    )
    rows = pmi_pairs(df, "doc_id", "text", window=1, min_count=1).collect()
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"]) for r in rows}
    # window=1 adjacencies: (x,y) x3, (x,z) x1 ; unigrams x:3 y:2 z:1, n_tok=6
    n_pairs = 4.0
    def pmi(cab, ca, cb):
        return round(math.log((cab / n_pairs) / ((ca / 6.0) * (cb / 6.0))), 4)
    assert got == {
        ("x", "y"): (3, pmi(3, 3, 2)),
        ("x", "z"): (1, pmi(1, 3, 1)),
    }


def test_unigram_logprob_matches_python(spark):
    import math

    from summingbird_spark.functions.text import unigram_logprob_scores

    texts = {1: "a a b", 2: "b c", 3: "a"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    counts = {"a": 3, "b": 2, "c": 1}
    n, v, al = 6.0, 3.0, 0.5

    def lp(w):
        return math.log((counts[w] + al) / (n + al * (v + 1.0)))

    want = {
        d: round(sum(lp(w) for w in t.split()) / len(t.split()), 4)
        for d, t in texts.items()
    }
    got = {
        r["doc_id"]: r["mean_logprob"]
        for r in unigram_logprob_scores(df, "doc_id", "text", alpha=0.5).collect()
    }
    assert got == want
