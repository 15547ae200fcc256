"""Property-based differential tests — the reference's ScalaCheck
methodology (SURVEY §5: random inputs + random batchers, platform vs
plain-Scala oracle). Hypothesis generates event sets and batcher widths;
the oracle is a plain-Python fold. Example counts are small because each
example is a full Spark job.
"""

import datetime as dt
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import summingbird_spark as sb
from summingbird_spark import source, to_dataframe

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000_000),  # offset seconds
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=60,
)

width_strategy = st.sampled_from([3600_000, 86_400_000, 7 * 86_400_000])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy, width=width_strategy)
def test_sum_by_key_prev_delta_property(spark, rows, width):
    data = [(BASE + dt.timedelta(seconds=s), k, v) for s, k, v in rows]
    df = spark.createDataFrame(data, "ts timestamp, key string, value long")
    p = source(df, time_col="ts").sum_by_key(
        "key", "value", semigroup="sum_long", batcher=sb.of_millis(width)
    )
    got = {(r.key, r.batch_id): (r.prev, r.delta) for r in to_dataframe(spark, p).collect()}

    per = defaultdict(lambda: defaultdict(int))
    for t, k, v in data:
        per[k][int(t.timestamp() * 1000) // width] += v
    want = {}
    for k, batches in per.items():
        run = None
        for b in sorted(batches):
            want[(k, b)] = (run, batches[b])
            run = batches[b] if run is None else run + batches[b]
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=events_strategy,
    width=width_strategy,
    split=st.integers(min_value=0, max_value=120),
)
def test_rollforward_split_property(spark, rows, width, split, tmp_path_factory):
    """Any split of the batch range into two sequential rollforward runs
    equals the one-shot aggregation (BatchedStoreProperties analog)."""
    from pyspark.sql import functions as F

    data = [(BASE + dt.timedelta(seconds=s), k, v) for s, k, v in rows]
    df = spark.createDataFrame(data, "ts timestamp, key string, value long").withColumn(
        sb.TIME_COL, F.col("ts")
    )
    batcher = sb.of_millis(width)
    b_lo = min(batcher.batch_of(t) for t, _, _ in data)
    b_hi = max(batcher.batch_of(t) for t, _, _ in data)
    b_mid = min(b_lo + split, b_hi)

    d = tmp_path_factory.mktemp("prop")
    store = sb.VersionedBatchStore(str(d / "s"), ["key"], "sum_long")
    sb.rollforward(spark, store, df, batcher, b_mid)
    snap = sb.rollforward(spark, store, df, batcher, b_hi)
    got = {r.key: r.value for r in snap.collect()}

    want = defaultdict(int)
    for _, k, v in data:
        want[k] += v
    assert got == dict(want)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=events_strategy,
    width=width_strategy,
    split=st.integers(min_value=0, max_value=120),
)
def test_client_merge_split_property(spark, rows, width, split, tmp_path_factory):
    """Any offline/online split of the batch range: client_view(offline
    snapshot through B, online per-batch deltas > B) == one-shot totals
    (ClientStore.scala:123-174 — the lambda identity for every split, not
    just one)."""
    from pyspark.sql import functions as F

    from summingbird_spark.client.merge import client_view

    data = [(BASE + dt.timedelta(seconds=s), k, v) for s, k, v in rows]
    df = spark.createDataFrame(data, "ts timestamp, key string, value long").withColumn(
        sb.TIME_COL, F.col("ts")
    )
    batcher = sb.of_millis(width)
    b_lo = min(batcher.batch_of(t) for t, _, _ in data)
    b_hi = max(batcher.batch_of(t) for t, _, _ in data)
    b_cut = min(b_lo + split, b_hi)

    d = tmp_path_factory.mktemp("cmprop")
    offline = sb.VersionedBatchStore(str(d / "off"), ["key"], "sum_long")
    sb.rollforward(spark, offline, df, batcher, b_cut)

    online = (
        df.withColumn("batch_id", batcher.batch_col(F.col("ts")))
        .groupBy("key", "batch_id")
        .agg(F.sum("value").cast("long").alias("value"))
    )
    merged = client_view(
        offline.read_last(spark)[1], online, ["key"], "sum_long",
        offline_batch=b_cut,
    )
    got = {r.key: r.value for r in merged.collect()}

    want = defaultdict(int)
    for _, k, v in data:
        want[k] += v
    assert got == dict(want)


def test_month_batcher_calendar_semantics(spark):
    """Months are variable-width: Jan 31 and Feb 1 land in different
    batches; batch bounds are calendar month starts."""
    b = sb.batcher.of_months()
    rows = [
        (dt.datetime(2024, 1, 31, 23, 59), "k", 1),
        (dt.datetime(2024, 2, 1, 0, 0), "k", 10),
        (dt.datetime(2024, 2, 29, 12, 0), "k", 100),  # leap february
        (dt.datetime(2024, 3, 1, 0, 0), "k", 1000),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, key string, value long")
    p = source(df, time_col="ts").sum_by_key("key", "value", batcher=b)
    got = {r.batch_id: r.delta for r in to_dataframe(spark, p).collect()}
    jan = (2024 - 1970) * 12 + 0
    assert got == {jan: 1, jan + 1: 110, jan + 2: 1000}
    assert b.earliest_time_of(jan + 1).replace(tzinfo=None) == dt.datetime(2024, 2, 1)


def test_scaled_combined_batcher_composition(spark):
    """ScaledBatcher over a CombinedBatcher (and vice versa): the Column
    expression, the Python batch_of, and earliest_time_of must agree
    across the switch point — compositions are where off-by-one batch
    assignment hides."""
    switch = dt.datetime(2024, 1, 10)
    combined = sb.batcher.CombinedBatcher(
        sb.of_days(1), sb.of_hours(6), switch
    )
    scaled = sb.batcher.ScaledBatcher(combined, 4)

    probes = [
        dt.datetime(2024, 1, 8, 3), dt.datetime(2024, 1, 9, 23, 59),
        dt.datetime(2024, 1, 10, 0, 0), dt.datetime(2024, 1, 10, 5, 59),
        dt.datetime(2024, 1, 10, 6, 0), dt.datetime(2024, 1, 12, 18),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in probes], "ts timestamp")
    for b in (combined, scaled):
        col_ids = [
            r.b for r in df.select(b.batch_col(F.col("ts")).alias("b")).collect()
        ]
        py_ids = [b.batch_of(t) for t in probes]
        assert col_ids == py_ids, (col_ids, py_ids)
    # contiguity across the switch: consecutive probes straddling it are
    # adjacent combined batches
    assert combined.batch_of(probes[2]) == combined.batch_of(probes[1]) + 1
    # scaled floors groups of 4 combined ids
    assert all(
        scaled.batch_of(t) == combined.batch_of(t) // 4 for t in probes
    )
    # earliest_time_of inverts batch_of at batch starts (pre- and
    # post-switch)
    for t in (dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 11, 6)):
        bid = combined.batch_of(t)
        assert combined.earliest_time_of(bid).replace(tzinfo=None) == t
        assert combined.batch_of(combined.earliest_time_of(bid)) == bid


def test_batched_sink_replay(spark, tmp_path):
    """BatchedSink: second write skips already-written batches
    (BatchedSink.scala:26-60)."""
    from pyspark.sql import functions as F

    batcher = sb.of_days(1)
    sink = sb.sinks.sinks.BatchedParquetSink(str(tmp_path / "bs"), batcher, time_col="ts")
    d1 = [(BASE + dt.timedelta(hours=h), h) for h in range(24)]
    df1 = spark.createDataFrame(d1, "ts timestamp, v long")
    sink.write(df1)
    assert len(sink.written_batches()) == 1
    first_files = sorted((tmp_path / "bs").rglob("*.parquet"))

    # second run covers day 1 (already written — must be skipped) + day 2
    d2 = d1 + [(BASE + dt.timedelta(days=1, hours=h), 100 + h) for h in range(24)]
    sink.write(spark.createDataFrame(d2, "ts timestamp, v long"))
    assert len(sink.written_batches()) == 2
    # day-1 files untouched (no rewrite)
    assert sorted(f for f in first_files if "batch_id" in str(f)) == sorted(
        f for f in (tmp_path / "bs").rglob("*.parquet") if f"batch_id={batcher.batch_of(BASE)}" in str(f)
    )
    assert sink.read(spark).count() == 48


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lefts=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=30),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
        ),
        min_size=0,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
)
def test_asof_join_replay_property(spark, lefts, rights):
    """As-of join vs a changelog-replay dict oracle: for each left event,
    the value is the latest right observation at or before it (None values
    are deletions — BatchedService changelog contract)."""
    from summingbird_spark.operators.asof import as_of_join

    ldf = spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=s), "k", i) for i, s in enumerate(lefts)],
        "t timestamp, key string, lid long",
    )
    rdf = spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=s), "k", v) for s, v in rights],
        "t timestamp, key string, val long",
    )
    out = as_of_join(ldf, rdf, "key", "t", "t", ["val"])
    got = {r.lid: r.val for r in out.collect()}

    chg = sorted(rights)
    want = {}
    for i, s in enumerate(lefts):
        vis = [v for rs, v in chg if rs <= s]
        want[i] = vis[-1] if vis else None
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lefts=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=25),
    rights=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    age=st.integers(min_value=1, max_value=200),
)
def test_asof_windowed_sum_property(spark, lefts, rights, age):
    """mode='sum' + max_age (windowed running total, the RANGE-frame path)
    vs a dict oracle: each left sees the sum of right values under the
    reference's EXCLUSIVE bound 0 <= t_l - t_r < max_age
    (BatchedWindowService.scala:35-72); NULL when none are visible."""
    from summingbird_spark.operators.asof import as_of_join

    ldf = spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=s), "k", i) for i, s in enumerate(lefts)],
        "t timestamp, key string, lid long",
    )
    rdf = spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=s), "k", v) for s, v in rights],
        "t timestamp, key string, val long",
    )
    out = as_of_join(
        ldf, rdf, "key", "t", "t", ["val"], mode="sum", semigroup="sum",
        max_age=age,
    )
    got = {r.lid: r.val for r in out.collect()}
    want = {}
    for i, s in enumerate(lefts):
        vis = [v for rs, v in rights if rs <= s and s - rs < age]
        want[i] = sum(vis) if vis else None
    assert got == want


def test_streaming_summer_plan_shape(spark, tmp_path):
    """Planner-shape invariant (TopologyTests analog): the streaming summer
    plan contains exactly one stateful FlatMapGroupsInPandasWithState node
    and one key exchange feeding it."""
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    src = stream_source(str(tmp_path), "ts timestamp, key string, value long", time_col="ts")
    plan = StreamPlanner(spark).plan(
        src.sum_by_key("key", "value", semigroup="sum_long")
    )
    logical = plan.dataframe._jdf.queryExecution().logical().toString()
    assert logical.count("FlatMapGroupsInPandasWithState") == 1


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=2, max_value=40),
    dim=st.integers(min_value=3, max_value=8),
    blocks=st.integers(min_value=1, max_value=6),
    thr=st.sampled_from([0.0, 0.3, 0.7, 0.95]),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_tile_near_dup_matches_numpy_all_pairs(spark, n, dim, blocks, thr, seed):
    """Distributed tile matmul == numpy all-pairs oracle for arbitrary
    corpus sizes / block counts / thresholds: every unordered pair ≥ thr
    appears exactly once (blocks=1 self-tile, blocks>n empty tiles, and
    ragged block occupancy all exercised)."""
    import numpy as np

    from summingbird_spark.functions.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, thr, method="block", blocks=blocks
        ).collect()
    ]
    assert len(got) == len(set(got)), "pair emitted more than once"
    Mf = np.stack([np.asarray([float(x) for x in M[i]], dtype=np.float32) for i in range(n)]).astype(np.float64)
    Mn = Mf / np.linalg.norm(Mf, axis=1, keepdims=True)
    S = Mn @ Mn.T
    ia, ib = np.nonzero(S >= thr)
    want = {(int(min(i, j)), int(max(i, j))) for i, j in zip(ia, ib) if i != j}
    assert set(got) == want


def test_combined_batcher_over_calendar_months(spark):
    """CombinedBatcher switching INTO a calendar batcher (daily history,
    monthly going forward — the roadmap's untested composition): Column
    expression, Python batch_of, and earliest_time_of agree across the
    switch, ids stay contiguous, and the summer groups correctly."""
    import datetime as dt

    from pyspark.sql import functions as F

    switch = dt.datetime(2024, 2, 1)
    b = sb.batcher.CombinedBatcher(sb.of_days(1), sb.batcher.of_months(1), switch)

    probes = [
        dt.datetime(2024, 1, 30, 12), dt.datetime(2024, 1, 31, 23, 59),
        dt.datetime(2024, 2, 1, 0, 0), dt.datetime(2024, 2, 29, 23, 59),
        dt.datetime(2024, 3, 1, 0, 0), dt.datetime(2024, 4, 15, 6),
    ]
    df = spark.createDataFrame([(t,) for t in probes], "ts timestamp")
    col_ids = [r.b for r in df.select(b.batch_col(F.col("ts")).alias("b")).collect()]
    py_ids = [b.batch_of(t) for t in probes]
    assert col_ids == py_ids, (col_ids, py_ids)
    # contiguity at the switch: last daily batch + 1 == first monthly batch,
    # and Feb (a leap month, variable width) is ONE batch
    assert py_ids[2] == py_ids[1] + 1
    assert py_ids[2] == py_ids[3]
    assert py_ids[4] == py_ids[3] + 1
    # earliest_time_of round-trips on both sides of the switch
    assert b.earliest_time_of(py_ids[0]).replace(tzinfo=None) == dt.datetime(2024, 1, 30)
    assert b.earliest_time_of(py_ids[2]).replace(tzinfo=None) == dt.datetime(2024, 2, 1)
    assert b.earliest_time_of(py_ids[4]).replace(tzinfo=None) == dt.datetime(2024, 3, 1)

    rows = [(t, "k", 1) for t in probes]
    p = source(
        spark.createDataFrame(rows, "ts timestamp, key string, value long"),
        time_col="ts",
    ).sum_by_key("key", "value", semigroup="sum_long", batcher=b)
    got = {r.batch_id: r.delta for r in to_dataframe(spark, p).collect()}
    assert got == {py_ids[0]: 1, py_ids[1]: 1, py_ids[2]: 2, py_ids[4]: 1, py_ids[5]: 1}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=events_strategy,
    width=width_strategy,
    split=st.integers(min_value=0, max_value=120),
    keep=st.sampled_from([None, 2, 3]),
)
def test_rollforward_split_property_changelog(
    spark, rows, width, split, keep, tmp_path_factory
):
    """The sparse change-log format (write_each_batch=True) under the same
    k-step == one-shot property, with retention/compaction interleaved:
    any split into two sequential multi-batch runs — each writing per-batch
    change-log versions, optionally vacuuming down to `keep` — must read
    back the same final totals as the plain one-shot rollforward."""
    from pyspark.sql import functions as F

    data = [(BASE + dt.timedelta(seconds=s), k, v) for s, k, v in rows]
    df = spark.createDataFrame(data, "ts timestamp, key string, value long").withColumn(
        sb.TIME_COL, F.col("ts")
    )
    batcher = sb.of_millis(width)
    b_lo = min(batcher.batch_of(t) for t, _, _ in data)
    b_hi = max(batcher.batch_of(t) for t, _, _ in data)
    b_mid = min(b_lo + split, b_hi)

    d = tmp_path_factory.mktemp("clprop")
    store = sb.VersionedBatchStore(
        str(d / "s"), ["key"], "sum_long", versions_to_keep=keep
    )
    sb.rollforward(spark, store, df, batcher, b_mid, write_each_batch=True)
    snap = sb.rollforward(spark, store, df, batcher, b_hi, write_each_batch=True)
    got = {r.key: r.value for r in snap.collect()}

    want = defaultdict(int)
    for _, k, v in data:
        want[k] += v
    assert got == dict(want)
    if keep is not None:
        assert len(store.versions()) <= keep


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=events_strategy,
    width=width_strategy,
    split=st.integers(min_value=0, max_value=120),
    sg_name=st.sampled_from(["count", "avg", "set", "moments"]),
)
def test_rollforward_split_property_lifted_carriers(
    spark, rows, width, split, sg_name, tmp_path_factory
):
    """The k-step == one-shot rollforward property for LIFTED-carrier
    semigroups through the change-log store format — the combination the
    round-7 carrier-schema fixes enable (empty version dirs and __prev__
    must be carrier-typed; values merge as carriers). Oracle is the
    Python py_lift/py_merge fold; integer inputs keep double sums exact,
    so equality is bitwise."""
    from pyspark.sql import functions as F

    from summingbird_spark.core import semigroup as sg_mod

    data = [(BASE + dt.timedelta(seconds=s), k, v) for s, k, v in rows]
    sg = sg_mod.get(sg_name)
    if sg_name == "set":
        data = [(t, k, str(v)) for t, k, v in data]
        schema = "ts timestamp, key string, value string"
    else:
        schema = "ts timestamp, key string, value long"
    df = spark.createDataFrame(data, schema).withColumn(sb.TIME_COL, F.col("ts"))
    batcher = sb.of_millis(width)
    b_lo = min(batcher.batch_of(t) for t, _, _ in data)
    b_hi = max(batcher.batch_of(t) for t, _, _ in data)
    b_mid = min(b_lo + split, b_hi)

    d = tmp_path_factory.mktemp("liftprop")
    store = sb.VersionedBatchStore(str(d / "s"), ["key"], sg_name)
    sb.rollforward(spark, store, df, batcher, b_mid, write_each_batch=True)
    # an empty covered tail past the last event exercises the
    # carrier-typed empty change-log dirs
    snap = sb.rollforward(spark, store, df, batcher, b_hi + 2, write_each_batch=True)

    def norm(v):
        if sg_name == "set":
            return tuple(v)
        if sg_name == "count":
            return v
        d_ = v.asDict() if hasattr(v, "asDict") else v
        return tuple(sorted(d_.items()))

    got = {r.key: norm(r.value) for r in snap.collect()}

    per = defaultdict(list)
    for _, k, v in data:
        per[k].append(v)
    want = {k: norm_py(sg, vs, sg_name) for k, vs in per.items()}
    assert got == want


def norm_py(sg, vs, sg_name):
    acc = sg.py_agg(vs)
    if sg_name == "set":
        return tuple(acc)
    if sg_name == "count":
        return acc
    if sg_name == "avg":
        return tuple(sorted({"s": float(acc["s"]), "n": acc["n"]}.items()))
    return tuple(sorted({k: float(x) if k != "n" else x for k, x in acc.items()}.items()))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=events_strategy,
    sg_name=st.sampled_from(["sum", "count", "set", "avg"]),
)
def test_loop_join_batch_equals_streaming_fold(spark, rows, sg_name):
    """Batch loop-join compile (left_join(StoreService)) equals the
    streaming self-loop (streaming_self_loop's per-key py_lift fold) on
    the same data for identity AND lifted carriers — the divergence
    class fixed in round 7 (batch raw-merged, streaming lifted)."""
    import summingbird_spark as sb
    from pyspark.sql import functions as F
    from summingbird_spark import source, to_dataframe
    from summingbird_spark.core import semigroup as sg_mod

    data = [
        (BASE + dt.timedelta(seconds=s), k, str(v) if sg_name == "set" else v, i)
        for i, (s, k, v) in enumerate(rows)
    ]
    vt = "string" if sg_name == "set" else "long"
    df = spark.createDataFrame(data, f"ts timestamp, key string, value {vt}, eid long")

    svc = sb.StoreService(value="value", out_col="seen", semigroup=sg_name,
                          order_by=["eid"])
    p = source(df, time_col="ts").left_join(svc, on="key")
    got = {r.eid: r.seen for r in to_dataframe(spark, p).collect()}

    # python oracle: per-key time-ordered scanLeft of py_lift folds
    sg = sg_mod.get(sg_name)
    by_key = defaultdict(list)
    for t, k, v, eid in sorted(data, key=lambda r: (r[0], r[3])):
        by_key[k].append((eid, v))
    want = {}
    for k, evs in by_key.items():
        st_ = None
        for eid, v in evs:
            want[eid] = st_
            lv = sg.py_lift(v)
            st_ = lv if st_ is None else sg.py_merge(st_, lv)
    norm = (lambda x: None if x is None else list(x)) if sg_name == "set" else (
        (lambda x: None if x is None else (x["s"] if isinstance(x, dict) else x.s,
                                           x["n"] if isinstance(x, dict) else x.n))
        if sg_name == "avg" else (lambda x: x)
    )
    assert {e: norm(v) for e, v in got.items()} == {
        e: norm(v) for e, v in want.items()
    }


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(min_value=0.0, max_value=1023.0, allow_nan=False),
        ),
        min_size=1,
        max_size=80,
    ),
    q=st.sampled_from([0.5, 0.9, 0.99]),
)
def test_distributed_rank_select_equals_sorted_list(spark, vals, q):
    """The cumulative-histogram rank select used by the graded quantile
    sandwich (r8 de-OOM): per key, the smallest DISTINCT value whose
    cumulative count reaches ceil(q*n) must equal the ceil(q*n)-th
    element of the fully sorted value list — including duplicate-heavy
    multisets, where the distinct-value cumulation is the part that can
    go wrong."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(vals, "key string, v double")
    cnts = df.groupBy("key", "v").agg(F.count(F.lit(1)).alias("c"))
    cum = cnts.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("key").orderBy("v"))
    ).withColumn("n", F.sum("c").over(Window.partitionBy("key")))
    got = {
        r.key: r.ex
        for r in cum.groupBy("key")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("v"))
            ).alias("ex")
        )
        .collect()
    }
    per = defaultdict(list)
    for k, v in vals:
        per[k].append(v)
    for k, vs in per.items():
        rank = math.ceil(q * len(vs))
        assert got[k] == sorted(vs)[rank - 1], (k, q, sorted(vs))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    weights=st.lists(st.integers(min_value=0, max_value=300),
                     min_size=1, max_size=60),
    context_len=st.integers(min_value=1, max_value=97),
    eos=st.integers(min_value=0, max_value=3),
)
def test_pack_examples_tiling_invariants(spark, weights, context_len, eos):
    """For ANY (weights, context_len, eos): segments tile the global
    stream exactly — per-example offsets are contiguous from 0 and sum
    to context_len (tail excepted), per-document segments cover
    [0, w+eos) in order, and total segment length equals the stream."""
    from summingbird_spark.functions.packing import pack_examples

    df = spark.createDataFrame(
        [(i, int(w)) for i, w in enumerate(weights)],
        "doc_id long, n_tokens long",
    )
    segs = pack_examples(df, "doc_id", "n_tokens", context_len, eos=eos).collect()
    total = sum(w + eos for w in weights)
    assert sum(r.seg_len for r in segs) == total
    by_ex = {}
    for r in segs:
        by_ex.setdefault(r.example_id, []).append(r)
    n_full = total // context_len
    for e, rows in by_ex.items():
        rows.sort(key=lambda r: r.example_offset)
        pos = 0
        for r in rows:
            assert r.example_offset == pos and r.seg_len > 0
            pos += r.seg_len
        assert pos == (context_len if e < n_full else total % context_len)
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.doc_offset)
        pos = 0
        for r in rows:
            assert r.doc_offset == pos
            pos += r.seg_len
        assert pos == weights[d] + eos
    # zero-weight docs with eos=0 occupy no stream space: absent
    if eos == 0:
        absent = {i for i, w in enumerate(weights) if w == 0}
        assert absent.isdisjoint(by_doc)
