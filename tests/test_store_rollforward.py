"""Incremental rollforward properties — the reference's multi-run batch
tests (BatchedStoreProperties.scala:1-191, VersionBatchedStoreTest.scala):
running k sequential merges must equal the one-shot aggregation.
"""

import datetime as dt
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark import TIME_COL, VersionedBatchStore, rollforward


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


@pytest.fixture()
def events_df(spark):
    rows = [(ts(i), f"k{i % 7}", i % 13) for i in range(200)]
    return (
        spark.createDataFrame(rows, "ts timestamp, key string, value long")
        .withColumn(TIME_COL, F.col("ts"))
    )


def oracle_through(hours):
    per = defaultdict(int)
    for i in range(min(hours, 200)):
        per[f"k{i % 7}"] += i % 13
    return dict(per)


def test_incremental_equals_oneshot(spark, events_df, tmp_path):
    batcher = sb.of_days(1)  # 200 hours ≈ 9 daily batches
    inc_store = VersionedBatchStore(str(tmp_path / "inc"), ["key"], "sum")
    one_store = VersionedBatchStore(str(tmp_path / "one"), ["key"], "sum")

    first_batch = batcher.batch_of(ts(0))
    # incremental: roll forward 3 batches at a time
    for through in range(first_batch + 2, first_batch + 9, 3):
        snap = rollforward(spark, inc_store, events_df, batcher, through)
    final_inc = {r.key: r.value for r in snap.collect()}

    snap_one = rollforward(spark, one_store, events_df, batcher, first_batch + 8)
    final_one = {r.key: r.value for r in snap_one.collect()}

    assert final_inc == final_one == oracle_through(9 * 24)


def test_rollforward_only_reads_new_batches(spark, events_df, tmp_path):
    """After a merge, re-merging through the same batch is a no-op read;
    later merges only aggregate the (last, through] interval."""
    batcher = sb.of_days(1)
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    b0 = batcher.batch_of(ts(0))
    rollforward(spark, store, events_df, batcher, b0 + 3)
    assert store.last_batch() == b0 + 3
    # day 0-3 inclusive = hours 0..95
    got = {r.key: r.value for r in store.read_last(spark)[1].collect()}
    assert got == oracle_through(96)
    # roll to the end
    rollforward(spark, store, events_df, batcher, b0 + 8)
    got = {r.key: r.value for r in store.read_last(spark)[1].collect()}
    assert got == oracle_through(240)
    assert store.versions() == [b0 + 3, b0 + 8]


def test_unit_batcher_first_run_keeps_events(spark, events_df, tmp_path):
    """UnitBatcher's earliest_time_of is the epoch for every batch id; the
    first-run upper-bound filter must not drop all events (ADVICE r1)."""
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    snap = rollforward(spark, store, events_df, sb.batcher.UNIT, 0)
    got = {r.key: r.value for r in snap.collect()}
    assert got == oracle_through(240)


def test_write_each_batch_snapshots_are_cumulative(spark, events_df, tmp_path):
    """Every per-batch snapshot is the TOTAL store through that batch
    (BatchedStore.scala:157-244 partials), produced in one pass — the job
    count must not grow O(batches)."""
    sc = spark.sparkContext

    def jobs_for(group, batcher, path, n_batches):
        store = VersionedBatchStore(path, ["key"], "sum")
        b0 = batcher.batch_of(ts(0))
        sc.setJobGroup(group, "write_each_batch one-pass check")
        try:
            rollforward(
                spark, store, events_df, batcher, b0 + n_batches - 1,
                write_each_batch=True,
            )
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return store, b0, len(sc.statusTracker().getJobIdsForGroup(group))

    # AQE materializes each query stage as a job, so the absolute count is
    # plan-shaped; what must NOT happen is growth with the batch count
    # (the old driver loop ran ≥2 jobs per batch).
    store5, b0, jobs5 = jobs_for("web5", sb.of_days(2), str(tmp_path / "s5"), 5)
    _, _, jobs20 = jobs_for("web20", sb.of_hours(12), str(tmp_path / "s20"), 20)
    assert jobs20 <= jobs5 + 2, (
        f"jobs grew with batch count: {jobs5} @5 batches vs {jobs20} @20"
    )

    assert store5.versions() == [b0 + i for i in range(5)]
    batcher = sb.of_days(2)
    for i in range(5):
        got = {
            r.key: r.value
            for r in store5.read_snapshot(spark, b0 + i).collect()
        }
        # 2-day batches are epoch-aligned, not Jan-1-aligned: covered hours
        # run to the batch's exclusive upper boundary
        hi = batcher.earliest_time_of(b0 + i + 1).replace(tzinfo=None)
        hours = int((hi - ts(0)).total_seconds() // 3600)
        assert got == oracle_through(max(hours, 0)), f"batch {i} snapshot wrong"


def test_write_each_batch_noncommutative(spark, tmp_path):
    """Cumulative one-pass fold respects time order for non-commutative
    semigroups (BatchedStore.scala:199-203 sorted reduce)."""
    rows = [(ts(i), "k", chr(ord("a") + i)) for i in range(8)]
    df = (
        spark.createDataFrame(rows, "ts timestamp, key string, value string")
        .withColumn(TIME_COL, F.col("ts"))
    )
    batcher = sb.of_hours(2)
    b0 = batcher.batch_of(ts(0))
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "concat")
    rollforward(spark, store, df, batcher, b0 + 3, write_each_batch=True)
    for i in range(4):
        got = store.read_snapshot(spark, b0 + i).collect()[0].value
        assert got == "abcdefgh"[: (i + 1) * 2], f"batch {i}"


def test_multi_key_lookup(spark, tmp_path):
    store = VersionedBatchStore(str(tmp_path / "s"), ["k1", "k2"], "sum")
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)], "k1 string, k2 long, value long"
    )
    store.write_snapshot(df, 0)
    got = store.lookup(spark, [("a", 2), ("b", 1), ("zz", 9)])
    assert got == {("a", 2): 20, ("b", 1): 30}


def test_write_each_batch_sparse(spark, tmp_path):
    """Change-log sparsity (VERDICT r5 item 5): per-batch version dirs
    hold only keys whose value CHANGED in that batch — written rows scale
    with |changed keys|, not |keys| × |batches|. 1000 keys seeded in batch
    0, then one key changing per batch for 6 batches: the 6 change-log
    dirs must hold exactly one row each, while every snapshot read still
    reconstructs total contents."""
    batcher = sb.of_hours(1)
    seed = [(ts(0), f"key{i}", 1) for i in range(1000)]
    changes = [(ts(b), f"key{b}", 10) for b in range(1, 7)]
    df = (
        spark.createDataFrame(seed + changes, "ts timestamp, key string, value long")
        .withColumn(TIME_COL, F.col("ts"))
    )
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    b0 = batcher.batch_of(ts(0))
    rollforward(spark, store, df, batcher, b0 + 6, write_each_batch=True)

    assert store.versions() == [b0 + i for i in range(7)]
    for i in range(7):
        assert store.is_changelog(b0 + i)
        n = spark.read.parquet(store._version_path(b0 + i)).count()
        assert n == (1000 if i == 0 else 1), f"batch {i}: {n} rows written"
    # reads forward-fill: full contents at every batch
    first = {r.key: r.value for r in store.read_snapshot(spark, b0).collect()}
    assert len(first) == 1000 and first["key3"] == 1
    mid = {r.key: r.value for r in store.read_snapshot(spark, b0 + 3).collect()}
    assert len(mid) == 1000 and mid["key3"] == 11 and mid["key6"] == 1
    last = {r.key: r.value for r in store.read_last(spark)[1].collect()}
    assert len(last) == 1000 and all(last[f"key{b}"] == 11 for b in range(1, 7))
    # compaction rewrites a change-log as an equivalent total snapshot
    store.compact(spark, b0 + 3)
    assert not store.is_changelog(b0 + 3)
    assert {
        r.key: r.value for r in store.read_snapshot(spark, b0 + 3).collect()
    } == mid
    # ...and later change-logs now overlay the compacted base
    assert {
        r.key: r.value for r in store.read_last(spark)[1].collect()
    } == last


def test_write_each_batch_and_retention(spark, events_df, tmp_path):
    batcher = sb.of_days(2)
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum", versions_to_keep=3)
    b0 = batcher.batch_of(ts(0))
    rollforward(spark, store, events_df, batcher, b0 + 4, write_each_batch=True)
    assert len(store.versions()) == 3  # retention pruned older versions
    got = {r.key: r.value for r in store.read_last(spark)[1].collect()}
    assert got == oracle_through(240)


def test_initial_store_seed(spark, events_df, tmp_path):
    init = spark.createDataFrame([("k0", 1000), ("zzz", 5)], "key string, value long")
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    store = sb.InitialBatchedStore(str(tmp_path / "s"), ["key"], "sum", init, b0 - 1)
    snap = rollforward(spark, store, events_df, batcher, b0 + 8)
    got = {r.key: r.value for r in snap.collect()}
    want = oracle_through(240)
    want["k0"] += 1000
    want["zzz"] = 5
    assert got == want


def test_summer_with_store_prev_includes_snapshot(spark, events_df, tmp_path):
    """sum_by_key(store=...) folds the persisted snapshot into prev —
    BatchedStore.merge semantics (BatchedStore.scala:373-401)."""
    init = spark.createDataFrame([("k1", 100)], "key string, value long")
    batcher = sb.of_days(1)
    b0 = batcher.batch_of(ts(0))
    store = sb.InitialBatchedStore(str(tmp_path / "s"), ["key"], "sum", init, b0 - 1)
    p = sb.source(events_df, time_col="ts").sum_by_key(
        "key", "value", semigroup="sum", store=store, batcher=batcher
    )
    rows = sb.to_dataframe(spark, p).collect()
    first_k1 = min((r for r in rows if r.key == "k1"), key=lambda r: r.batch_id)
    assert first_k1.prev == 100
    first_k0 = min((r for r in rows if r.key == "k0"), key=lambda r: r.batch_id)
    assert first_k0.prev is None


def test_hll_sketch_rollforward_merges(spark, events_df, tmp_path):
    """HLL sketches are a real semigroup: k-step incremental rollforward of
    sketch values must estimate identically to the one-shot sketch."""
    from pyspark.sql import functions as F

    from summingbird_spark.core.semigroup import HllSemigroup

    sg = HllSemigroup()
    batcher = sb.of_days(2)
    b0 = batcher.batch_of(ts(0))
    # distinct-ish payload: value per (key, hour)
    ev = events_df.withColumn("value", (F.col("value") * 17 + F.dayofyear("ts")))

    inc = sb.VersionedBatchStore(str(tmp_path / "inc"), ["key"], sg)
    for through in (b0 + 1, b0 + 4):
        snap = sb.rollforward(spark, inc, ev, batcher, through)
    got_inc = {
        r.key: r.est
        for r in snap.select("key", HllSemigroup.estimate(F.col("value")).alias("est")).collect()
    }

    one = sb.VersionedBatchStore(str(tmp_path / "one"), ["key"], sg)
    snap1 = sb.rollforward(spark, one, ev, batcher, b0 + 4)
    got_one = {
        r.key: r.est
        for r in snap1.select("key", HllSemigroup.estimate(F.col("value")).alias("est")).collect()
    }
    assert got_inc == got_one
    # sanity: estimates are near the exact distinct counts
    exact = {
        r.key: r.n
        for r in ev.groupBy("key").agg(F.countDistinct("value").alias("n")).collect()
    }
    for k, est in got_one.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k])


# ---- readDeltaLog + BatchedDeltaService (BatchedStore.scala:345-352) -------


def test_read_delta_log_snapshot_timestamp_and_union(spark, events_df, tmp_path):
    """Snapshot rows carry latestTimeOf(lastBatch) (1 ms before the next
    batch starts); delta rows keep their event times; keys fold correctly."""
    batcher = sb.of_days(1)
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    cut_b = batcher.batch_of(dt.datetime(2024, 1, 4, tzinfo=dt.timezone.utc))
    rollforward(spark, store, events_df, batcher, cut_b - 1)  # days 1-3

    sink = sb.BatchedParquetSink(str(tmp_path / "d"), batcher, TIME_COL)
    sink.write(
        events_df.where(F.col("ts") >= F.lit("2024-01-04").cast("timestamp"))
        .select("key", "value", TIME_COL)
    )

    log = sb.read_delta_log(spark, store, sink, out_col="state")
    snap_ts = dt.datetime(2024, 1, 3, 23, 59, 59, 999000)
    snap_rows = {r.key: r.state for r in log.where(F.col(TIME_COL) == snap_ts).collect()}
    assert snap_rows == oracle_through(72)  # days 1-3 folded
    n_delta = log.where(F.col(TIME_COL) > snap_ts).count()
    assert n_delta == 200 - 72  # every later event kept, own timestamp


def test_delta_service_equals_full_history_asof(spark, events_df, tmp_path):
    """Rollforward consistency: for probes at/after the snapshot instant,
    left_join(BatchedDeltaService) == as_of_join(mode='sum') over the FULL
    raw history — the snapshot fold loses nothing."""
    from summingbird_spark import source, to_dataframe
    from summingbird_spark.operators.asof import as_of_join

    batcher = sb.of_days(1)
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    cut_b = batcher.batch_of(dt.datetime(2024, 1, 4, tzinfo=dt.timezone.utc))
    rollforward(spark, store, events_df, batcher, cut_b - 1)
    sink = sb.BatchedParquetSink(str(tmp_path / "d"), batcher, TIME_COL)
    sink.write(
        events_df.where(F.col("ts") >= F.lit("2024-01-04").cast("timestamp"))
        .select("key", "value", TIME_COL)
    )

    probes = events_df.select("ts", "key").withColumn("pid", F.monotonically_increasing_id())
    svc = sb.BatchedDeltaService(store, sink)
    via_svc = to_dataframe(
        spark, source(probes, time_col="ts").left_join(svc, on="key")
    ).select("pid", "ts", "state")

    full = as_of_join(
        probes,
        events_df.select("key", F.col("value").alias("state"), F.col("ts").alias("rts")),
        on="key", left_time="ts", right_time="rts",
        value_cols=["state"], mode="sum", semigroup="sum",
    ).select("pid", "ts", "state")

    cut = dt.datetime(2024, 1, 3, 23, 59, 59, 999000)
    got = {r.pid: r.state for r in via_svc.where(F.col("ts") >= cut).collect()}
    want = {r.pid: r.state for r in full.where(F.col("ts") >= cut).collect()}
    assert got == want and len(got) > 0
    # probes before the snapshot instant see nothing: that history exists
    # only folded inside the snapshot (the reference's presence contract)
    early = via_svc.where(F.col("ts") < cut).collect()
    assert len(early) > 0 and all(r.state is None for r in early)


def test_read_delta_log_empty_store_and_unit_batcher(spark, events_df, tmp_path):
    batcher = sb.of_days(1)
    store = VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    sink = sb.BatchedParquetSink(str(tmp_path / "d"), batcher, TIME_COL)
    sink.write(events_df.select("key", "value", TIME_COL))
    # empty store: the log degenerates to the raw delta history
    assert sb.read_delta_log(spark, store, sink).count() == 200

    rollforward(spark, store, events_df, batcher, batcher.batch_of(
        dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)))
    unit_sink = sb.BatchedParquetSink(str(tmp_path / "u"), sb.UNIT, TIME_COL)
    unit_sink.write(events_df.select("key", "value", TIME_COL))
    with pytest.raises(ValueError, match="time-based batcher"):
        sb.read_delta_log(spark, store, unit_sink)


def test_bucketed_store_rollforward_split_equals_oneshot(spark, tmp_path):
    """BucketedBatchStore is a drop-in VersionedBatchStore: a split
    rollforward equals the one-shot totals, snapshots read back through
    the catalog, and lookup still works."""
    import datetime as dt

    from pyspark.sql import functions as F

    data = [
        (dt.datetime(2024, 1, 1 + i % 6, 8), f"k{i % 7}", i % 5 + 1)
        for i in range(120)
    ]
    df = spark.createDataFrame(data, "ts timestamp, key string, value long").withColumn(
        sb.TIME_COL, F.col("ts")
    )
    batcher = sb.of_days(1)
    b_lo = batcher.batch_of(dt.datetime(2024, 1, 1))
    store = sb.BucketedBatchStore(
        str(tmp_path / "bstore"), ["key"], "sum_long", num_buckets=4,
        table_prefix="t_bucketed_rf",
    )
    sb.rollforward(spark, store, df, batcher, b_lo + 2)
    snap = sb.rollforward(spark, store, df, batcher, b_lo + 5)
    got = {r.key: r.value for r in snap.collect()}
    want = {}
    for _, k, v in data:
        want[k] = want.get(k, 0) + v
    assert got == want
    # reads go through the catalog (bucketed scan)
    assert spark.catalog.tableExists("t_bucketed_rf_b" + str(b_lo + 5))
    assert store.lookup(spark, ["k0"]) == {"k0": want["k0"]}


def test_incremental_dedup_rejects_cross_batch_duplicates(spark, tmp_path):
    """Exact dedup as sumByKey(digest, min doc_id) over a rolled-forward
    store: a batch-1 duplicate of batch-0 content must lose to the
    original during the prev-merge, and the state must accumulate."""
    from pyspark.sql import functions as F

    from summingbird_spark import VersionedBatchStore, of_days, rollforward
    from summingbird_spark.core.graph import TIME_COL

    store = VersionedBatchStore(str(tmp_path / "dd"), ["digest"], "min")
    batcher = of_days(10)
    rows = [
        (0, "original text"),
        (1, "only in batch zero"),
        (15, "original text"),      # batch-1 dup of doc 0
        (16, "fresh in batch one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    deltas = df.select(
        F.md5("text").alias("digest"),
        F.col("doc_id").cast("long").alias("value"),
        F.timestamp_seconds(F.col("doc_id") * 86400).alias(TIME_COL),
    )
    rollforward(spark, store, deltas, batcher, 0)   # docs 0, 1
    first = {r["digest"]: r["value"] for r in store.read_last(spark)[1].collect()}
    assert sorted(first.values()) == [0, 1]
    rollforward(spark, store, deltas, batcher, 1)   # docs 15, 16 merge in
    final = {r["digest"]: r["value"] for r in store.read_last(spark)[1].collect()}
    assert sorted(final.values()) == [0, 1, 16]     # 15 lost to 0 (same digest)


def test_write_each_batch_lifted_carrier_empty_trailing_batch(spark, tmp_path):
    """Empty change-log version dirs must carry the semigroup CARRIER
    schema, not the raw input type (ADVICE r6, high): an 'avg' store's
    change-log rows are struct<s,n> while the raw value is long — an
    empty trailing batch (through_batch past the last event) used to
    write a long-typed empty dir, and the overlay's multi-dir parquet
    read then failed or mis-typed `value` depending on schema sampling."""
    rows = [(ts(i), f"k{i % 2}", i + 1) for i in range(4)]  # batches b0, b0+1
    df = (
        spark.createDataFrame(rows, "ts timestamp, key string, value long")
        .withColumn(TIME_COL, F.col("ts"))
    )
    batcher = sb.of_hours(2)
    b0 = batcher.batch_of(ts(0))
    store = VersionedBatchStore(str(tmp_path / "avg"), ["key"], "avg")
    # through b0+3: batch b0+2 and the trailing b0+3 both have no events
    snap = rollforward(spark, store, df, batcher, b0 + 3, write_each_batch=True)
    vt = dict(snap.dtypes)["value"]
    assert vt.startswith("struct"), vt
    got = {r.key: (r.value.s, r.value.n) for r in snap.collect()}
    assert got == {"k0": (1 + 3, 2), "k1": (2 + 4, 2)}
    # the intermediate empty batch has NO dir (dirs stay sparse —
    # O(changed batches)) but still reads back via the overlay, with the
    # carrier schema
    import os

    assert not os.path.isdir(store._version_path(b0 + 2))
    mid = store.read_snapshot(spark, b0 + 2)
    assert dict(mid.dtypes)["value"] == vt
    assert {r.key: (r.value.s, r.value.n) for r in mid.collect()} == got
    # the dirs that DO exist (delta batches + the covering bound) agree
    # on the carrier schema — including the empty bound dir
    for b in (0, 1, 3):
        vdt = dict(spark.read.parquet(store._version_path(b0 + b)).dtypes)["value"]
        assert vdt == vt, f"batch {b}: {vdt}"


def test_write_each_batch_set_carrier_empty_store_bootstrap(spark, tmp_path):
    """First-run rollforward over an interval with ZERO events writes a
    carrier-typed (array, for 'set') empty snapshot a later roll can
    overlay without schema conflict."""
    batcher = sb.of_hours(2)
    b0 = batcher.batch_of(ts(0))
    empty = (
        spark.createDataFrame([], "ts timestamp, key string, value string")
        .withColumn(TIME_COL, F.col("ts"))
    )
    store = VersionedBatchStore(str(tmp_path / "set"), ["key"], "set")
    snap0 = rollforward(spark, store, empty, batcher, b0, write_each_batch=True)
    assert dict(snap0.dtypes)["value"].startswith("array"), snap0.dtypes
    assert snap0.count() == 0
    rows = [(ts(3), "k", "x"), (ts(3), "k", "y")]
    df = (
        spark.createDataFrame(rows, "ts timestamp, key string, value string")
        .withColumn(TIME_COL, F.col("ts"))
    )
    snap = rollforward(spark, store, df, batcher, b0 + 1, write_each_batch=True)
    got = {r.key: sorted(r.value) for r in snap.collect()}
    assert got == {"k": ["x", "y"]}
