"""Options resolution, state commit protocol, time-pathed sources,
stream-stream joins, planner invariants — the reference's platform
plumbing (SURVEY §3/§4) re-expressed for Spark.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark import TIME_COL, source, to_dataframe
from summingbird_spark.batch.planner import BatchPlanner, dependants
from summingbird_spark.batch.state import CheckpointState, StateError, run_batch_job
from summingbird_spark.core.options import Options
from summingbird_spark.sources.time_pathed import TimePathedSource


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


@pytest.fixture()
def events_df(spark):
    rows = [(ts(i), f"k{i % 3}", i) for i in range(96)]
    return spark.createDataFrame(rows, "ts timestamp, key string, value long")


# ---- options ---------------------------------------------------------------

def test_options_get_first_innermost_wins():
    o = Options().set("outer", shards=4, broadcast=True).set("inner", shards=8)
    assert o.get_first(["inner", "outer"], "shards") == 8
    assert o.get_first(["inner", "outer"], "broadcast") is True
    assert o.get_first(["inner", "outer"], "missing", "d") == "d"


def test_named_options_drive_summer_shards(spark, events_df):
    """`.name` labels the chain ENDING at the marker (summingbird: options
    attach to the named producer and its upstream) — so name the summer
    after building it."""
    opts = Options().set("agg", shards=3)
    p = source(events_df, time_col="ts").sum_by_key("key", "value").name("agg")
    df = BatchPlanner(spark, options=opts).plan(p).run()
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    got = {r.key: r.delta for r in df.collect()}
    assert got == {f"k{k}": sum(i for i in range(96) if i % 3 == k) for k in range(3)}
    # the option must inject an explicit repartition into the physical plan
    assert "REPARTITION_BY_NUM" in plan_str, plan_str
    # and without the option, no explicit repartition appears
    p2 = source(events_df, time_col="ts").sum_by_key("key", "value").name("agg")
    plan2 = BatchPlanner(spark).plan(p2).run()._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" not in plan2


def test_planner_forces_utc_session(spark, events_df):
    """Planning a summer under a non-UTC session must flip the session to
    UTC before batch_col compiles: batch assignment mixes unix_millis
    (UTC instants) with calendar functions the session timezone
    interprets, and the reference batchers are UTC by construction
    (CalendarBatcher.scala:120-124)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
        p = source(events_df, time_col="ts").sum_by_key("key", "value")
        BatchPlanner(spark).plan(p)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_commutativity_option_switches_fold_path(spark):
    """MonoidIsCommutative is declared, not inferred: overriding it per
    name must switch between the sorted-fold and plain-agg physical plans."""
    rows = [(ts(2), "k", "b"), (ts(1), "k", "a"), (ts(3), "k", "c")]
    df = spark.createDataFrame(rows, "ts timestamp, key string, value string").repartition(4)

    def plan_of(opts):
        p = source(df, time_col="ts").sum_by_key("key", "value", semigroup="concat").name("j")
        out = BatchPlanner(spark, options=opts).plan(p).run()
        return out, out._jdf.queryExecution().analyzed().toString()

    # concat is non-commutative by default → time-sorted fold (array_sort)
    out, plan_default = plan_of(None)
    assert "array_sort" in plan_default
    assert out.collect()[0].delta == "abc"  # time order despite shuffled input
    # declared commutative → plain aggregation path, no sort
    _, plan_commut = plan_of(Options().set("j", commutative=True))
    assert "array_sort" not in plan_commut


# ---- state protocol --------------------------------------------------------

def test_state_commit_and_refuse_replay(spark, events_df, tmp_path):
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    store = sb.VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    state = CheckpointState(str(tmp_path / "state"))
    ev = events_df.withColumn(TIME_COL, F.col("ts"))

    run_batch_job(spark, store, ev, batcher, b0 + 1, state)
    assert state.committed_through() == b0 + 1
    # replaying an already-committed interval is refused
    with pytest.raises(StateError):
        state.begin(b0 + 1)
    # rolling forward continues from the committed bound
    run_batch_job(spark, store, ev, batcher, b0 + 3, state)
    assert state.committed_through() == b0 + 3
    got = {r.key: r.value for r in store.read_last(spark)[1].collect()}
    assert got == {f"k{k}": sum(i for i in range(96) if i % 3 == k) for k in range(3)}


def test_state_failure_leaves_no_commit(spark, events_df, tmp_path):
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    store = sb.VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    state = CheckpointState(str(tmp_path / "state"))
    bad = events_df.withColumn(TIME_COL, F.col("ts")).withColumn(
        "value", F.assert_true(F.col("value") < 0).cast("long")
    )
    with pytest.raises(Exception):
        run_batch_job(spark, store, bad, batcher, b0 + 1, state)
    assert state.committed_through() is None  # nothing committed


def test_state_detects_concurrent_commit(tmp_path):
    """Two double-scheduled runs (cron overlap, a retry racing the
    original) both begin() the same uncommitted interval; the loser's
    succeed() must fail loudly instead of silently appending the same
    interval to the ledger twice (lost-update guard)."""
    state = CheckpointState(str(tmp_path / "state"), start_batch=0)
    a = state.begin(5)
    b = state.begin(5)  # second scheduler, same view of the ledger
    a.succeed()
    assert state.committed_through() == 5
    with pytest.raises(StateError, match="concurrent commit"):
        b.succeed()
    # ledger intact: one entry, bound unchanged
    assert state.committed_through() == 5
    assert len(state._load()["history"]) == 1
    # and a fresh begin from the NEW ledger position still works
    c = state.begin(7)
    c.succeed()
    assert state.committed_through() == 7


# ---- time-pathed source ----------------------------------------------------

def test_time_pathed_probe_and_shrink(spark, events_df, tmp_path):
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    root = str(tmp_path / "tp")
    TimePathedSource.write_batches(events_df, root, batcher)
    src = TimePathedSource(root)
    assert src.available_batches() == [b0, b0 + 1, b0 + 2, b0 + 3]
    # requesting beyond what exists shrinks to the available prefix
    assert src.shrink_interval(b0, b0 + 10) == (b0, b0 + 3)
    assert src.shrink_interval(b0 + 9, b0 + 10) is None
    # punch a hole: contiguity breaks the satisfiable range
    import shutil

    shutil.rmtree(f"{root}/batch_id={b0 + 2}")
    assert src.shrink_interval(b0, b0 + 3) == (b0, b0 + 1)

    df = src.read(spark, b0, b0 + 1, batcher)
    assert df.count() == 48  # two days × 24 hourly events
    # partition pruning: only the two requested dirs are scanned
    scan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in scan


def test_time_pathed_multi_format(spark, events_df, tmp_path):
    """The layout/probe/shrink machinery is format-independent (the
    reference's TimePathedSource ingested TSV/LZO event logs the same
    way): json and csv batch dirs probe identically to parquet and read
    back the same rows — csv through an explicit schema so the event
    time comes back typed."""
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    truth = {
        (r.key, r.value)
        for r in events_df.where(F.col("ts") < ts(48)).collect()
    }

    for fmt, kwargs in (
        ("json", {}),
        ("orc", {}),
        ("csv", {"schema": "ts timestamp, key string, value long",
                 "header": "true"}),
    ):
        root = str(tmp_path / f"tp_{fmt}")
        TimePathedSource.write_batches(
            events_df, root, batcher, fmt=fmt,
            **({"header": "true"} if fmt == "csv" else {}),
        )
        src = TimePathedSource(root, fmt=fmt, **kwargs)
        assert src.available_batches() == [b0, b0 + 1, b0 + 2, b0 + 3], fmt
        assert src.shrink_interval(b0, b0 + 10) == (b0, b0 + 3), fmt
        df = src.read(spark, b0, b0 + 1, batcher)
        got = {(r.key, r.value) for r in df.select("key", "value").collect()}
        assert got == truth, fmt


def test_time_pathed_producer_in_pipeline(spark, events_df, tmp_path):
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    root = str(tmp_path / "tp")
    TimePathedSource.write_batches(events_df, root, batcher)
    p = TimePathedSource(root).producer(b0, b0 + 1, batcher).sum_by_key(
        "key", "value", batcher=batcher
    )
    rows = to_dataframe(spark, p).collect()
    assert {r.batch_id for r in rows} == {b0, b0 + 1}


# ---- queue (spout-analog) source -------------------------------------------

def test_queue_frame_decode(spark):
    """Kafka wire frames → typed events (the TimeExtractor analog,
    StormPlatform.scala:87-91): payload event time when named, broker
    timestamp fallback, malformed payloads kept as NULL rows (countable,
    not silently dropped). Pure Column transform — identical behavior on
    this static frame and a live streaming frame."""
    import json

    from summingbird_spark.sources.queue import (
        KAFKA_WIRE_SCHEMA,
        decode_json_frames,
        kafka_stream_source,
    )

    def frame(i, payload):
        return (
            str(i).encode(),
            payload.encode(),
            "events",
            0,
            i,
            ts(i),
            0,
        )

    rows = [
        frame(0, json.dumps({"ts": "2024-01-05 00:00:00", "key": "a", "value": 3})),
        frame(1, json.dumps({"ts": "2024-01-06 00:00:00", "key": "b", "value": 4})),
        frame(2, "not json at all"),
    ]
    frames = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    sch = "ts timestamp, key string, value long"

    out = decode_json_frames(frames, sch, time_col="ts", keep_key=True)
    assert set(out.columns) == {"__key__", "ts", "key", "value", "__queue_ts__"}
    good = {(r.key, r.value) for r in out.where(F.col("ts").isNotNull()).collect()}
    assert good == {("a", 3), ("b", 4)}
    # event time is the PAYLOAD's, not the broker's
    a = out.where(F.col("key") == "a").collect()[0]
    assert str(a.ts).startswith("2024-01-05") and a.ts != a["__queue_ts__"]
    # malformed payload: NULL fields, row retained
    assert out.where(F.col("key").isNull()).count() == 1

    # broker-timestamp fallback when the payload carries no event time
    out2 = decode_json_frames(frames, "key string, value long")
    b = out2.where(F.col("key") == "b").collect()[0]
    assert b["__queue_ts__"] == ts(1)

    # a payload time_col that doesn't exist fails loudly at build time
    with pytest.raises(ValueError, match="not a payload field"):
        decode_json_frames(frames, "key string, value long", time_col="ts")

    # the Source node carries the right event-time column for the planner
    src = kafka_stream_source("events", "broker:9092", sch, time_col="ts")
    assert src.time_col == "ts" and "events" in src.source_name
    src2 = kafka_stream_source("events", "broker:9092", "key string, value long")
    assert src2.time_col == "__queue_ts__"


# ---- planner invariants ----------------------------------------------------

def test_diamond_fanout_detected_and_compiled_once(spark, events_df):
    calls = []

    def count_transform(df):
        calls.append(1)
        return df

    src = source(events_df, time_col="ts").transform(count_transform)
    left = src.filter("value % 2 = 0")
    right = src.filter("value % 2 = 1")
    tail = left.merge(right).sum_by_key("key", "value").snapshot()

    assert dependants(tail)[id(src)] == 2  # fan-out seen by the planner
    planner = BatchPlanner(spark, cache_fanout=True)
    df = planner.plan(tail).run()
    assert len(calls) == 1  # diamond compiled once (memoized)
    got = {r.key: r.value for r in df.collect()}
    assert got == {f"k{k}": sum(i for i in range(96) if i % 3 == k) for k in range(3)}


# ---- stream-stream join (Buffer analog) ------------------------------------

def test_stream_stream_left_join(spark, tmp_path):
    """Buffer leftJoin (Producer.scala:396-399): left events see right
    events of the same key within the window before them."""
    import glob, shutil

    from summingbird_spark.streaming.joins import stream_stream_left_join

    d = tmp_path
    lrows = [(ts(i), f"k{i % 2}", i) for i in range(4)]
    rrows = [(ts(i) - dt.timedelta(minutes=30), f"k{i % 2}", 100 + i) for i in range(4)]
    for name, rows, schema in [
        ("l", lrows, "lts timestamp, key string, lv long"),
        ("r", rrows, "rts timestamp, key string, rv long"),
    ]:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / f"w_{name}"))
        (d / name).mkdir()
        for f in glob.glob(str(d / f"w_{name}" / "*.parquet")):
            shutil.move(f, str(d / name / "data.parquet"))

    l = spark.readStream.schema("lts timestamp, key string, lv long").parquet(str(d / "l"))
    r = spark.readStream.schema("rts timestamp, key string, rv long").parquet(str(d / "r"))
    joined = stream_stream_left_join(l, r, "key", "lts", "rts", window="45 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT key, lv, rv FROM ssj").collect()
    got = {(r.lv): r.rv for r in rows}
    # each left event i pairs with right event i (30 min earlier, same key)
    assert got == {0: 100, 1: 101, 2: 102, 3: 103}


# ---- round-2 ADVICE regressions -------------------------------------------


def test_batched_sink_covered_through(spark, events_df, tmp_path):
    """A batch the input only partially covers must stay unwritten until a
    later run fully covers it (BatchedSink.scala:26-60) — otherwise the
    partial content is frozen forever by the replay-skip."""
    from summingbird_spark.sinks.sinks import BatchedParquetSink

    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    sink = BatchedParquetSink(str(tmp_path / "sink"), batcher, time_col="ts")

    # run 1: input reaches 12h into day 2 — only days 0-1 are fully covered
    sink.write(events_df.where(F.col("value") < 60), covered_through=b0 + 1)
    assert sink.written_batches() == [b0, b0 + 1]

    # run 2: full input; day 2-3 now written, days 0-1 replayed not rewritten
    sink.write(events_df, covered_through=b0 + 3)
    assert sink.written_batches() == [b0 + i for i in range(4)]
    n = sink.read(spark).count()
    assert n == 96  # nothing lost, nothing duplicated


def test_of_months_quarterly_batcher(spark):
    q = sb.batcher.of_months(3)
    assert q.batch_of(dt.datetime(1970, 1, 15)) == 0
    assert q.batch_of(dt.datetime(1970, 3, 31)) == 0
    assert q.batch_of(dt.datetime(1970, 4, 1)) == 0 + 1
    assert q.batch_of(dt.datetime(2024, 2, 2)) == ((2024 - 1970) * 12 + 1) // 3
    assert q.earliest_time_of(1) == dt.datetime(1970, 4, 1, tzinfo=dt.timezone.utc)
    # column expression agrees with the python-side assignment
    df = spark.createDataFrame(
        [(dt.datetime(2024, 2, 2),), (dt.datetime(1970, 3, 31),)], "t timestamp"
    )
    got = [r.b for r in df.select(q.batch_col(F.col("t")).alias("b")).collect()]
    assert got == [q.batch_of(dt.datetime(2024, 2, 2)), 0]


def test_cli_through_time_is_exclusive(spark, tmp_path, capsys, monkeypatch):
    """--through-time must not commit the batch containing t: a mid-batch
    run would freeze a partial batch (ADVICE r1)."""
    import json

    from summingbird_spark.cli import main

    monkeypatch.setenv("SUMMINGBIRD_OUT", str(tmp_path))
    rc = main([
        "--job", "examples.events_daily_totals:build",
        "--through-time", "2024-01-05T12:00:00",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # Jan 5 noon is mid-batch for a daily batcher: commit stops at Jan 4's batch
    assert out["committed_through"] == sb.of_days(1).batch_of(dt.datetime(2024, 1, 5)) - 1


def test_rollforward_forces_utc_session(spark, events_df, tmp_path):
    """Batch assignment mixes unix_millis (UTC) with session-tz calendar
    functions; rollforward must force UTC rather than mis-assign batches."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        batcher = sb.of_days(1)
        store = sb.VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
        ev = events_df.withColumn(TIME_COL, F.col("ts"))
        sb.rollforward(spark, store, ev, batcher, batcher.batch_of(ts(0)) + 3)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = sum(r.value for r in store.read_last(spark)[1].collect())
        assert got == sum(range(96))  # hours 0..95 all inside days 0-3
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ordered_chunk_fold_matches_unchunked(spark):
    """ordered_chunk_ms: two-phase time-chunked ordered fold (bounded
    buffers for hot keys) must equal the single collect+sort fold for a
    non-commutative semigroup."""
    from summingbird_spark.batch.planner import BatchPlanner

    rows = [(ts(i), "hot" if i % 4 else f"k{i % 3}", chr(97 + i % 26)) for i in range(200)]
    df = spark.createDataFrame(rows, "ts timestamp, key string, value string")

    def run(options):
        p = (
            source(df, time_col="ts")
            .sum_by_key("key", "value", semigroup="concat", batcher=sb.of_days(2))
            .name("agg")
        )
        out = BatchPlanner(spark, options=options).plan(p).run()
        return {(r.key, r.batch_id): (r.prev, r.delta) for r in out.collect()}

    plain = run(None)
    chunked = run(Options().set("agg", ordered_chunk_ms=3 * 3600 * 1000))
    assert plain == chunked
    assert any(len(d) > 20 for _, d in plain.values())  # hot key exists


def test_external_lookup_service_batch_and_stream(spark, events_df, tmp_path):
    """left_join(ExternalLookupService): one fetch per Arrow batch over
    unique keys (FlatMapOperation.combine multiGet semantics), same DAG on
    batch and stream; missing keys join as NULL."""
    import glob, shutil

    from summingbird_spark.streaming.planner import StreamPlanner, stream_source

    def fetch(keys):
        # pretend-RPC: only even keys exist
        return {k: (f"name-{k}", len(str(k))) for k in keys if k in ("k0", "k2")}

    svc = sb.ExternalLookupService(fetch, "svc_name string, svc_len long")
    p = source(events_df, time_col="ts").left_join(svc, on="key")
    rows = to_dataframe(spark, p).collect()
    assert len(rows) == 96
    for r in rows:
        if r.key in ("k0", "k2"):
            assert r.svc_name == f"name-{r.key}" and r.svc_len == 2
        else:
            assert r.svc_name is None and r.svc_len is None

    # same DAG through the streaming planner
    d = tmp_path / "src"
    d.mkdir()
    events_df.coalesce(1).write.parquet(str(tmp_path / "w"))
    for f in glob.glob(str(tmp_path / "w" / "*.parquet")):
        shutil.move(f, str(d / "c0.parquet"))
    src = stream_source(str(d), "ts timestamp, key string, value long", time_col="ts")
    q = (
        StreamPlanner(spark)
        .plan(src.left_join(svc, on="key"))
        .start_to_memory(spark, "ext_lookup", output_mode="append")
    )
    q.awaitTermination(120)
    srows = spark.sql("SELECT key, svc_name FROM ext_lookup").collect()
    assert len(srows) == 96
    assert all((r.svc_name == f"name-{r.key}") == (r.key in ("k0", "k2")) for r in srows)


def test_structural_memoization_diamond(spark):
    """Dagon analog (DagOptimizer's Literal-graph collapsing): a diamond
    built from two VALUE-equal but object-distinct chains compiles to one
    DataFrame, counts as fan-out 2 (so cache_fanout caches it once), and
    the bag-union semantics still duplicate rows. Different predicates and
    nondeterministic expressions must never merge."""
    from pyspark.sql import functions as F

    from summingbird_spark import source
    from summingbird_spark.batch.planner import BatchPlanner

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, 2.0)], "user_id long, value double"
    )
    src = source(df, name="t")
    b1 = src.filter(F.col("value") > 0).map(v2=F.col("value") * 2)
    b2 = src.filter(F.col("value") > 0).map(v2=F.col("value") * 2)
    pl = BatchPlanner(spark, cache_fanout=True)
    plan = pl.plan(b1.merge(b2))
    d1, d2 = pl.compile(b1), pl.compile(b2)
    assert d1 is d2          # value-equal subtrees are ONE node
    assert d1.is_cached      # combined fan-out 2 -> cached once
    assert plan.dataframe.count() == 4  # bag union still duplicates
    assert pl.compile(src.filter(F.col("value") > 1)) is not d1
    r1, r2 = src.map(r=F.rand()), src.map(r=F.rand())
    assert pl.compile(r1) is not pl.compile(r2)  # independent draws
    d1.unpersist()


def test_fanout_not_double_counted_by_value_equal_copies(spark):
    """Dedupe the dependants walk by STRUCTURAL key (ADVICE r6): two
    value-equal chains collapse to one node, so their shared interior
    (the filter below the map) has exactly ONE consumer — deduping the
    walk by id() used to walk both copies and double-count it, causing
    spurious cache() under cache_fanout."""
    from summingbird_spark import source
    from summingbird_spark.batch.planner import BatchPlanner, dependants

    df = spark.createDataFrame([(1, 5.0), (2, -1.0)], "user_id long, value double")
    src = source(df, name="t")

    def chain():
        return src.filter(F.col("value") > 0).map(v2=F.col("value") * 2)

    b1, b2 = chain(), chain()
    pl = BatchPlanner(spark, cache_fanout=True)
    plan = pl.plan(b1.merge(b2))
    skey = pl._skey
    counts = dependants(b1.merge(b2), keyfn=skey)
    # collapsed graph: merge consumes the map twice; the map consumes the
    # filter ONCE; the filter consumes the source once
    assert counts[skey(b1)] == 2
    assert counts[skey(b1.parents[0])] == 1
    assert counts[skey(src)] == 1
    assert pl.compile(b1).is_cached            # genuine fan-out 2
    assert not pl.compile(b1.parents[0]).is_cached  # no spurious cache
    assert plan.dataframe.count() == 2
    pl.compile(b1).unpersist()


def test_structural_memo_pins_nodes(spark):
    """The planner's structural-key memo holds a strong reference to each
    node it keyed (ADVICE r6): without it, a GC'd graph frees its ids for
    CPython reuse and a later plan() could read a stale key — and hence a
    stale compiled DataFrame — for a brand-new node."""
    import gc

    from summingbird_spark import source
    from summingbird_spark.batch.planner import BatchPlanner

    df = spark.createDataFrame([(1, 5.0)], "user_id long, value double")
    pl = BatchPlanner(spark)
    node = source(df, name="t").filter(F.col("value") > 0)
    pl.plan(node)
    assert all(ent[0] is not None for ent in pl._skmemo.values())
    pinned = {id(ent[0]) for ent in pl._skmemo.values()}
    assert id(node) in pinned
    node_ref = node
    del node
    gc.collect()
    # the memoized nodes survive the caller dropping its references
    assert any(ent[0] is node_ref for ent in pl._skmemo.values())


def test_time_pathed_stray_subdir_is_not_data(tmp_path):
    """A batch dir whose only non-hidden entry is a SUBDIRECTORY (a
    writer's leftover temp tree, a notes folder) holds no readable
    records and must not mark the batch available (ADVICE r10)."""
    root = tmp_path / "tp"
    d = root / "batch_id=42"
    (d / "extras").mkdir(parents=True)
    src = TimePathedSource(str(root))
    assert src.available_batches() == []
    # markers still don't count either
    (d / "_SUCCESS").write_bytes(b"")
    assert src.available_batches() == []
    # a real part FILE does
    (d / "part-00000.parquet").write_bytes(b"x")
    assert src.available_batches() == [42]


def test_state_warns_on_network_filesystem(tmp_path):
    """flock is advisory-at-best on network/fuse mounts: CheckpointState
    must say so out loud instead of silently degrading the commit guard
    (ADVICE r10). Local filesystems stay silent."""
    import os
    import warnings as w

    from summingbird_spark.batch.state import _warn_if_lock_unreliable

    mounts = tmp_path / "mounts"
    state_dir = tmp_path / "state"
    state_dir.mkdir()
    real = os.path.realpath(str(state_dir))

    mounts.write_text(f"server:/export {real} nfs4 rw 0 0\n/dev/sda1 / ext4 rw 0 0\n")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert _warn_if_lock_unreliable(str(state_dir), mounts_file=str(mounts))
    assert any("flock" in str(x.message) for x in rec)

    # longest-prefix match: the state dir sits under / (ext4) here — local, silent
    mounts.write_text("/dev/sda1 / ext4 rw 0 0\n")
    assert not _warn_if_lock_unreliable(str(state_dir), mounts_file=str(mounts))

    # fuse-backed remotes count as unreliable too
    mounts.write_text(f"host: {real} fuse.sshfs rw 0 0\n")
    with w.catch_warnings(record=True):
        w.simplefilter("always")
        assert _warn_if_lock_unreliable(str(state_dir), mounts_file=str(mounts))

    # undeterminable mount table -> best-effort no-op, never a crash
    assert not _warn_if_lock_unreliable(
        str(state_dir), mounts_file=str(tmp_path / "missing")
    )

    # a mount path with a MALFORMED octal escape (trailing backslash →
    # UnicodeDecodeError, a ValueError) must be skipped, not crash the
    # scan — and later valid lines still match (ADVICE r11)
    mounts.write_text(
        f"bad /mnt/broken\\ badfs rw 0 0\nserver:/e {real} nfs4 rw 0 0\n"
    )
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert _warn_if_lock_unreliable(str(state_dir), mounts_file=str(mounts))
    assert any("flock" in str(x.message) for x in rec)
