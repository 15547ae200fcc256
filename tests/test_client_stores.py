"""Serving-side store wrappers (summingbird-client zoo): ClientMergeable
read-merged-write, SideEffectStore, PresentingStore."""

import datetime as dt
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

import summingbird_spark as sb
from summingbird_spark import TIME_COL
from summingbird_spark.client.merge import client_view
from summingbird_spark.client.stores import (
    ClientMergeable,
    KVParquetStore,
    SideEffectStore,
    presenting_store,
)
from summingbird_spark.streaming.store import OnlineStore


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


@pytest.fixture()
def lambda_stores(spark, tmp_path):
    """offline store committed through batch b_off; online store holding
    the next batch's deltas."""
    batcher = sb.of_days(1)
    rows = [(ts(i), f"k{i % 3}", i) for i in range(48)]  # days 0-1
    df = spark.createDataFrame(rows, "ts timestamp, key string, value long")
    ev = df.withColumn(TIME_COL, F.col("ts"))
    b0 = batcher.batch_of(ts(0))

    offline = sb.VersionedBatchStore(str(tmp_path / "off"), ["key"], "sum_long")
    sb.rollforward(spark, offline, ev, batcher, b0 + 1)  # days 0-1 committed

    online = OnlineStore(str(tmp_path / "on"), ["key"], "sum_long")
    d2 = spark.createDataFrame(
        [("k0", b0 + 2, 1000), ("k1", b0 + 2, 2000)],
        "key string, batch_id long, delta long",
    )
    online.multi_merge(d2)
    return offline, online, b0


def test_client_mergeable_premerge_totals_and_write(spark, lambda_stores, tmp_path):
    offline, online, b0 = lambda_stores
    cm = ClientMergeable(offline, online, ["key"], "sum_long")

    # day 0-1 totals per key (offline), plus online b0+2 deltas
    off = {r.key: r.value for r in offline.read_last(spark)[1].collect()}

    new_delta = spark.createDataFrame(
        [("k0", b0 + 3, 7), ("k2", b0 + 3, 9), ("kNEW", b0 + 3, 5)],
        "key string, batch_id long, delta long",
    )
    pre = {r.key: r.value for r in cm.merge(new_delta).collect()}
    # pre-merge = offline ⊕ online batches ≤ b0+3 — NOT including the new delta
    assert pre["k0"] == off["k0"] + 1000
    assert pre["k2"] == off["k2"]          # no online state for k2
    assert pre["kNEW"] is None             # never seen anywhere

    # the delta IS persisted: the readable view now includes it
    view = {r.key: r.value for r in cm.readable(spark).collect()}
    assert view["k0"] == off["k0"] + 1000 + 7
    assert view["k2"] == off["k2"] + 9
    assert view["kNEW"] == 5

    # parity with client_view built from scratch over the same stores
    scratch = {
        r.key: r.value
        for r in client_view(
            offline.read_last(spark)[1],
            online.read(spark),
            ["key"],
            "sum_long",
            offline_batch=offline.last_batch(),
        ).collect()
    }
    assert view == scratch


def test_client_mergeable_visibility_bound(spark, lambda_stores):
    """A delta at batch b sees online state ≤ b only (multiGetBatch
    batch.prev semantics): merging at b0+1 must NOT see the b0+2 online
    rows."""
    offline, online, b0 = lambda_stores
    cm = ClientMergeable(offline, online, ["key"], "sum_long")
    off = {r.key: r.value for r in offline.read_last(spark)[1].collect()}
    # the online b0+2 rows are visible to a delta at b0+2 but not below:
    probe_low = spark.createDataFrame(
        [("k1", b0 + 1, 1)], "key string, batch_id long, delta long"
    )
    pre_low = {r.key: r.value for r in cm.merge(probe_low).collect()}
    assert pre_low["k1"] == off["k1"]  # b0+2 online delta invisible at b0+1


def test_readable_through_batch_with_empty_offline(spark, tmp_path):
    """readable(through_batch=N) must bound the online side even when the
    offline store is empty — an absent batch layer is not a license to
    serve batches beyond N."""
    online = OnlineStore(str(tmp_path / "on"), ["key"], "sum_long")
    online.multi_merge(
        spark.createDataFrame(
            [("k", 1, 10), ("k", 2, 100), ("k", 3, 1000)],
            "key string, batch_id long, delta long",
        )
    )
    empty_off = sb.VersionedBatchStore(str(tmp_path / "off"), ["key"], "sum_long")
    cm = ClientMergeable(empty_off, online, ["key"], "sum_long")
    view = {r.key: r.value for r in cm.readable(spark, through_batch=2).collect()}
    assert view == {"k": 110}  # batch 3 excluded


def test_streaming_asof_sum_with_max_age_builds(spark):
    """mode='sum' + max_age_seconds is SUPPORTED since r5 (retraction-
    buffer state in the group kernel; batch parity in
    tests/test_streaming_parity.py::test_streaming_asof_windowed_sum_parity)
    — the plan must build without the old NotImplementedError."""
    from summingbird_spark.streaming.temporal import streaming_as_of_join

    l = spark.createDataFrame([(ts(1), "k")], "t timestamp, key string")
    r = spark.createDataFrame([(ts(0), "k", 1.0)], "t timestamp, key string, v double")
    out = streaming_as_of_join(
        l, r, "key", "t", "t", ["v"], mode="sum", max_age_seconds=60.0
    )
    assert "v" in out.columns


def test_side_effect_store_fires_with_touched_keys(spark, tmp_path):
    online = OnlineStore(str(tmp_path / "on"), ["key"], "sum_long")
    seen = []
    store = SideEffectStore(online, lambda keys: seen.extend(
        sorted(r.key for r in keys.collect())
    ))
    d = spark.createDataFrame(
        [("a", 0, 1), ("b", 0, 2), ("a", 0, 3)],
        "key string, batch_id long, delta long",
    )
    store.multi_merge(d)
    assert seen == ["a", "b"]
    assert store.read(spark).count() == 2  # delegation works


def test_presenting_store_snapshots_touched_keys(spark, lambda_stores, tmp_path):
    offline, online, b0 = lambda_stores
    cm = ClientMergeable(offline, online, ["key"], "sum_long")
    target = KVParquetStore(str(tmp_path / "present"), ["key"])
    ps = presenting_store(online, cm, target, lambda v: v * 10)

    d = spark.createDataFrame(
        [("k0", b0 + 3, 7)], "key string, batch_id long, delta long"
    )
    ps.multi_merge(d)
    off = {r.key: r.value for r in offline.read_last(spark)[1].collect()}
    got = {r.key: r.presented for r in target.read(spark).collect()}
    # snapshot AFTER merge: (offline ⊕ 1000 ⊕ 7) × 10, only the touched key
    assert got == {"k0": (off["k0"] + 1000 + 7) * 10}

    # second touch upserts, untouched keys retained
    d2 = spark.createDataFrame(
        [("k1", b0 + 3, 1)], "key string, batch_id long, delta long"
    )
    ps.multi_merge(d2)
    got = {r.key: r.presented for r in target.read(spark).collect()}
    assert got["k0"] == (off["k0"] + 1000 + 7) * 10
    assert got["k1"] == (off["k1"] + 2000 + 1) * 10


def test_presenting_store_debounce_batches_fires(spark, lambda_stores, tmp_path):
    """every_n_merges=3: the first two merges only append to the pending
    log (no target write); the third fire presents the distinct union of
    ALL touched keys at their latest combined values. flush() forces a
    fire for a trailing partial batch."""
    offline, online, b0 = lambda_stores
    cm = ClientMergeable(offline, online, ["key"], "sum_long")
    target = KVParquetStore(str(tmp_path / "present_db"), ["key"])
    ps = presenting_store(online, cm, target, lambda v: v * 10,
                          every_n_merges=3)

    def merge(key, delta):
        ps.multi_merge(spark.createDataFrame(
            [(key, b0 + 3, delta)], "key string, batch_id long, delta long"
        ))

    merge("k0", 7)
    merge("k0", 5)   # same key again: must present the LATEST total once
    assert target.read(spark) is None  # debounced: no fire yet
    merge("k1", 1)   # third merge fires
    off = {r.key: r.value for r in offline.read_last(spark)[1].collect()}
    got = {r.key: r.presented for r in target.read(spark).collect()}
    assert got == {
        "k0": (off["k0"] + 1000 + 7 + 5) * 10,
        "k1": (off["k1"] + 2000 + 1) * 10,
    }

    # one more merge stays pending; flush() forces the trailing fire
    merge("k0", 2)
    assert {r.key: r.presented for r in target.read(spark).collect()} == got
    ps.flush(spark)
    got2 = {r.key: r.presented for r in target.read(spark).collect()}
    assert got2["k0"] == (off["k0"] + 1000 + 7 + 5 + 2) * 10
    assert got2["k1"] == got["k1"]


def test_online_store_lifted_carrier_multi_merge(spark, tmp_path):
    """multi_merge folds CARRIER deltas with agg_carrier, not the
    raw-contract agg: a 'count' tally of 5 must add 5 (agg would re-count
    the row as 1); an 'avg' struct must struct-add, not crash."""
    cnt = OnlineStore(str(tmp_path / "cnt"), ["key"], "count")
    cnt.multi_merge(spark.createDataFrame(
        [("k", 0, 5), ("k", 1, 2)], "key string, batch_id long, delta long"))
    cnt.multi_merge(spark.createDataFrame(
        [("k", 0, 3)], "key string, batch_id long, delta long"))
    got = {(r.key, r.batch_id): r.value for r in cnt.read(spark).collect()}
    assert got == {("k", 0): 8, ("k", 1): 2}

    avg = OnlineStore(str(tmp_path / "avg"), ["key"], "avg")
    d = spark.createDataFrame(
        [("k", 0, (10.0, 2)), ("k", 0, (5.0, 1))],
        "key string, batch_id long, delta struct<s double, n long>")
    avg.multi_merge(d)
    [r] = avg.read(spark).collect()
    assert (r.value.s, r.value.n) == (15.0, 3)


def test_client_merge_lifted_carrier_online_totals(spark, tmp_path):
    """client_view over a 'count' lambda architecture: the online layer's
    per-batch tallies must SUM across batches (agg_carrier), not count
    the delta rows."""
    batcher = sb.of_days(1)
    rows = [(ts(i), f"k{i % 2}", i) for i in range(24)]  # day 0: 12 per key
    df = spark.createDataFrame(rows, "ts timestamp, key string, value long")
    ev = df.withColumn(TIME_COL, F.col("ts"))
    b0 = batcher.batch_of(ts(0))
    offline = sb.VersionedBatchStore(str(tmp_path / "off"), ["key"], "count")
    sb.rollforward(spark, offline, ev, batcher, b0)

    online = OnlineStore(str(tmp_path / "on"), ["key"], "count")
    online.multi_merge(spark.createDataFrame(
        [("k0", b0 + 1, 5), ("k0", b0 + 2, 7), ("k1", b0 + 1, 1)],
        "key string, batch_id long, delta long",
    ))
    got = {
        r.key: r.value
        for r in client_view(
            offline.read_last(spark)[1], online.read(spark), ["key"], "count",
            offline_batch=b0,
        ).collect()
    }
    assert got == {"k0": 12 + 5 + 7, "k1": 12 + 1}


def test_client_mergeable_lifted_carrier_bootstrap(spark, tmp_path):
    """ClientMergeable.merge on a FRESH store (no offline, empty online)
    with a struct-carrier semigroup: the absent sides must be
    carrier-typed NULLs, not VOID literals — merge_null_safe analyzes
    field extraction on both branches (review r7 finding, confirmed by
    repro: VOID __off__/__on__ threw INVALID_EXTRACT_BASE_FIELD_TYPE)."""
    online = OnlineStore(str(tmp_path / "on"), ["key"], "avg")
    cm = ClientMergeable(None, online, ["key"], "avg")
    d1 = spark.createDataFrame(
        [("k", 0, (10.0, 2))],
        "key string, batch_id long, delta struct<s double, n bigint>",
    )
    pre1 = {r.key: r.value for r in cm.merge(d1).collect()}
    assert pre1 == {"k": None}  # nothing before the first merge
    d2 = spark.createDataFrame(
        [("k", 0, (5.0, 1))],
        "key string, batch_id long, delta struct<s double, n bigint>",
    )
    [r] = cm.merge(d2).collect()
    assert (r.value.s, r.value.n) == (10.0, 2)  # pre-state pins before write
    [s] = online.read(spark).collect()
    assert (s.value.s, s.value.n) == (15.0, 3)


def test_online_store_hll_sketch_carrier_merge(spark, tmp_path):
    """hll carriers (binary sketches) through multi_merge: agg_carrier
    must hll_union the sketches, never re-sketch them (the identity-lift
    fast path would feed sketch bytes back into hll_sketch_agg)."""
    from summingbird_spark.core.semigroup import HllSemigroup

    sg = HllSemigroup()
    store = OnlineStore(str(tmp_path / "hll"), ["key"], sg)
    half1 = spark.createDataFrame(
        [("k", i) for i in range(500)], "key string, v long"
    ).groupBy("key").agg(sg.agg(F.col("v")).alias("delta")).withColumn(
        "batch_id", F.lit(0)
    )
    half2 = spark.createDataFrame(
        [("k", i) for i in range(250, 750)], "key string, v long"
    ).groupBy("key").agg(sg.agg(F.col("v")).alias("delta")).withColumn(
        "batch_id", F.lit(0)
    )
    store.multi_merge(half1)
    store.multi_merge(half2)
    [r] = store.read(spark).select(
        sg.estimate(F.col("value")).alias("est")
    ).collect()
    assert abs(r.est - 750) / 750 < 0.05  # union of overlapping halves
