"""Interval join: semantics vs a naive Python product, chunk-boundary
cases, overlapping windows, left-outer, and plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from summingbird_spark.operators.interval import interval_join


def T(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


LEFT = [  # (id, key, t)
    (1, "a", T(0, 30)),
    (2, "a", T(1, 0)),       # exactly at a window start -> inclusive
    (3, "a", T(2, 0)),       # exactly at a window end -> exclusive
    (4, "a", T(23, 59)),
    (5, "b", T(1, 30)),
    (6, "c", T(5, 0)),       # key with no windows
]
RIGHT = [  # (wid, key, start, end)
    (10, "a", T(0), T(2)),
    (11, "a", T(1), T(3)),   # overlaps window 10
    (12, "b", T(1), T(1)),   # empty window -> matches nothing
    (13, "b", T(0), T(4)),
]


def naive(how="inner"):
    out = []
    for lid, lk, t in LEFT:
        hits = [
            wid
            for wid, rk, s, e in RIGHT
            if rk == lk and s <= t < e
        ]
        if hits:
            out += [(lid, wid) for wid in hits]
        elif how == "left":
            out.append((lid, None))
    return sorted(out)


@pytest.fixture(scope="module")
def dfs(spark):
    l = spark.createDataFrame(LEFT, "lid long, key string, t timestamp")
    r = spark.createDataFrame(
        RIGHT, "wid long, key string, w_start timestamp, w_end timestamp"
    )
    return l, r


@pytest.mark.parametrize("chunk", [600, 3600, 7200, 86400])
def test_interval_join_matches_naive_across_chunk_sizes(spark, dfs, chunk):
    l, r = dfs
    got = interval_join(
        l, r, "key", "t", "w_start", "w_end", chunk_seconds=chunk
    ).select("lid", "wid")
    assert sorted((x["lid"], x["wid"]) for x in got.collect()) == naive()


def test_interval_join_left_outer(spark, dfs):
    l, r = dfs
    got = interval_join(
        l, r, "key", "t", "w_start", "w_end", how="left", chunk_seconds=3600
    ).select("lid", "wid")
    assert sorted(
        (x["lid"], x["wid"]) for x in got.collect()
    ) == naive("left")


def test_interval_join_no_duplicate_pairs_on_long_windows(spark, dfs):
    """A window spanning many chunks must still meet each event once."""
    l, r = dfs
    got = interval_join(
        l, r, "key", "t", "w_start", "w_end", chunk_seconds=60
    ).select("lid", "wid")
    rows = [(x["lid"], x["wid"]) for x in got.collect()]
    assert len(rows) == len(set(rows)) and sorted(rows) == naive()


def test_interval_join_is_equi_join_not_theta(spark, dfs):
    l, r = dfs
    plan = (
        interval_join(l, r, "key", "t", "w_start", "w_end", chunk_seconds=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ev = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200_000),  # event offset seconds
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1, max_size=30,
)
_win = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200_000),   # window start
        st.integers(min_value=0, max_value=50_000),    # window length (0 = empty)
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1, max_size=15,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_ev, windows=_win, chunk=st.sampled_from([600, 3600, 50_000]))
def test_interval_join_property_random_windows(spark, events, windows, chunk):
    base = dt.datetime(2024, 1, 1)
    l_rows = [
        (i, k, base + dt.timedelta(seconds=s)) for i, (s, k) in enumerate(events)
    ]
    r_rows = [
        (
            i,
            k,
            base + dt.timedelta(seconds=s),
            base + dt.timedelta(seconds=s + ln),
        )
        for i, (s, ln, k) in enumerate(windows)
    ]
    l = spark.createDataFrame(l_rows, "lid long, key string, t timestamp")
    r = spark.createDataFrame(
        r_rows, "wid long, key string, w_start timestamp, w_end timestamp"
    )
    got = sorted(
        (x["lid"], x["wid"])
        for x in interval_join(
            l, r, "key", "t", "w_start", "w_end", chunk_seconds=chunk
        ).select("lid", "wid").collect()
    )
    want = sorted(
        (lid, wid)
        for lid, lk, t in l_rows
        for wid, rk, s, e in r_rows
        if lk == rk and s <= t < e
    )
    assert got == want


def test_interval_join_stream_parity(spark, tmp_path):
    """The same interval semantics run in the streaming layer as a native
    stream-stream join with a time-range condition + watermarks; its
    result must equal the batch interval_join."""
    import glob
    import shutil

    left_rows = [(i, "k%d" % (i % 3), T(i % 24, 13)) for i in range(40)]
    right_rows = [
        (100 + i, "k%d" % (i % 3), T(i % 20), T((i % 20) + 3)) for i in range(20)
    ]
    lfmt = "lid long, key string, t timestamp"
    rfmt = "wid long, key string, w_start timestamp, w_end timestamp"
    ld, rd = tmp_path / "l", tmp_path / "r"
    for d, rows, fmt in [(ld, left_rows, lfmt), (rd, right_rows, rfmt)]:
        d.mkdir()
        for i, chunk in enumerate([rows[: len(rows) // 2], rows[len(rows) // 2 :]]):
            spark.createDataFrame(chunk, fmt).coalesce(1).write.parquet(
                str(d / f"c{i}")
            )
            for f in glob.glob(str(d / f"c{i}" / "*.parquet")):
                shutil.move(f, str(d / f"chunk{i}.parquet"))
            shutil.rmtree(str(d / f"c{i}"))

    batch = interval_join(
        spark.read.schema(lfmt).parquet(str(ld)),
        spark.read.schema(rfmt).parquet(str(rd)),
        "key", "t", "w_start", "w_end", chunk_seconds=3600,
    )
    want = sorted((r["lid"], r["wid"]) for r in batch.select("lid", "wid").collect())

    ls = (
        spark.readStream.schema(lfmt).parquet(str(ld)).withWatermark("t", "1 day")
    )
    rs = (
        spark.readStream.schema(rfmt)
        .parquet(str(rd))
        .withWatermark("w_start", "1 day")
    )
    j = ls.alias("l").join(
        rs.alias("r"),
        F.expr(
            "l.key = r.key AND l.t >= r.w_start AND l.t < r.w_end"
        ),
        "inner",
    ).select("l.lid", "r.wid")
    q = (
        j.writeStream.format("memory")
        .queryName("ij_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["lid"], r["wid"]) for r in spark.sql("SELECT * FROM ij_stream").collect()
    )
    assert got == want and len(got) > 0


def test_interval_join_hot_key_bounded(spark):
    """One key owns every window AND every event (the adversarial case
    for a per-key theta join): the chunked plan still completes with
    uniform (key, chunk) buckets, and counts match the naive product."""
    base = dt.datetime(2024, 1, 1)
    events = [
        (i, "hot", base + dt.timedelta(seconds=(i * 37) % 100_000))
        for i in range(2000)
    ]
    windows = [
        (
            i,
            "hot",
            base + dt.timedelta(seconds=(i * 499) % 100_000),
            base + dt.timedelta(seconds=(i * 499) % 100_000 + 900),
        )
        for i in range(200)
    ]
    l = spark.createDataFrame(events, "lid long, key string, t timestamp")
    r = spark.createDataFrame(
        windows, "wid long, key string, w_start timestamp, w_end timestamp"
    )
    got = (
        interval_join(l, r, "key", "t", "w_start", "w_end", chunk_seconds=900)
        .count()
    )
    want = sum(
        1
        for _, _, t in events
        for _, _, s, e in windows
        if s <= t < e
    )
    assert got == want > 0
