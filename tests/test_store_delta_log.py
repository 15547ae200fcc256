"""OnlineStore.append_delta accumulator (r17): the delta-log write
discipline must be observationally identical to per-epoch multi_merge —
same read contents, same per-trigger reconstructability, same replay
guard — with compact() folding back to a materialized version."""

import pytest
from pyspark.sql import functions as F

from summingbird_spark.streaming.store import OnlineStore


def _mk(spark, rows):
    # store keys are (key..., batch_id); use one batch per row's key hash
    return spark.createDataFrame(
        [(k, 0, v) for k, v in rows], "key string, batch_id long, delta long"
    )


def _contents(df):
    return {(r.key, r.batch_id): r.value for r in df.collect()}


EPOCHS = [
    [("a", 1), ("b", 10)],
    [("a", 2), ("c", 100)],
    [("b", 20), ("c", 200), ("a", 4)],
]


def test_append_delta_matches_sequential_multi_merge(spark, tmp_path):
    seq = OnlineStore(str(tmp_path / "seq"), ["key"], "sum_long")
    acc = OnlineStore(str(tmp_path / "acc"), ["key"], "sum_long")
    for e, rows in enumerate(EPOCHS):
        seq.multi_merge(_mk(spark, rows), epoch_id=e)
        acc.append_delta(_mk(spark, rows), epoch_id=e)
    assert _contents(acc.read(spark)) == _contents(seq.read(spark))
    assert acc.last_epoch() == seq.last_epoch() == 2


def test_read_through_epoch_reconstructs_each_trigger(spark, tmp_path):
    """VERDICT r16 item 1's acceptability condition: the store contents
    as of every trigger stay reconstructable from the written data."""
    seq = OnlineStore(str(tmp_path / "seq"), ["key"], "sum_long")
    acc = OnlineStore(str(tmp_path / "acc"), ["key"], "sum_long")
    for e, rows in enumerate(EPOCHS):
        seq.multi_merge(_mk(spark, rows), epoch_id=e)
        acc.append_delta(_mk(spark, rows), epoch_id=e)
        assert _contents(acc.read(spark, through_epoch=e)) == _contents(
            seq.read(spark)
        ), f"prefix through epoch {e} diverged"


def test_append_delta_replay_guard_is_noop(spark, tmp_path):
    """at-least-once foreachBatch: a replayed epoch must not double-count,
    whether the prior application was a delta append or a version write."""
    acc = OnlineStore(str(tmp_path / "acc"), ["key"], "sum_long")
    acc.append_delta(_mk(spark, EPOCHS[0]), epoch_id=0)
    acc.append_delta(_mk(spark, EPOCHS[0]), epoch_id=0)  # replayed
    assert _contents(acc.read(spark)) == {("a", 0): 1, ("b", 0): 10}
    # versioned high-water guards delta appends too (crash-restart after
    # a multi_merge restart picks the accumulator back up)
    acc.multi_merge(_mk(spark, EPOCHS[1]), epoch_id=1)
    acc.append_delta(_mk(spark, EPOCHS[1]), epoch_id=1)  # replayed
    assert _contents(acc.read(spark)) == {("a", 0): 3, ("b", 0): 10, ("c", 0): 100}
    # compact with nothing pending still vacuums the delta dirs the
    # multi_merge's version already covers, without changing contents
    acc.compact(spark)
    assert acc._delta_epochs() == []
    assert _contents(acc.read(spark)) == {("a", 0): 3, ("b", 0): 10, ("c", 0): 100}
    assert acc.last_epoch() == 1


def test_append_delta_requires_epoch(spark, tmp_path):
    acc = OnlineStore(str(tmp_path / "x"), ["key"], "sum_long")
    with pytest.raises(ValueError, match="epoch_id"):
        acc.append_delta(_mk(spark, EPOCHS[0]))


def test_compact_materializes_and_vacuums(spark, tmp_path):
    acc = OnlineStore(str(tmp_path / "acc"), ["key"], "sum_long")
    for e, rows in enumerate(EPOCHS):
        acc.append_delta(_mk(spark, rows), epoch_id=e)
    want = _contents(acc.read(spark))
    acc.compact(spark)
    assert acc._delta_epochs() == []  # folded dirs vacuumed
    assert acc._versions() != []  # materialized version exists
    assert _contents(acc.read(spark)) == want
    assert acc.last_epoch() == 2  # high-water survives compaction
    # further appends keep folding on top of the compacted version
    acc.append_delta(_mk(spark, [("a", 8)]), epoch_id=3)
    assert _contents(acc.read(spark))[("a", 0)] == want[("a", 0)] + 8


def test_fold_order_matters_and_is_epoch_order(spark, tmp_path):
    """Non-commutative evidence: with the first-wins semigroup the fold
    order is observable; read() must fold delta epochs in EPOCH order
    (earliest wins), exactly like the sequential merge."""
    seq = OnlineStore(str(tmp_path / "seq"), ["key"], "first")
    acc = OnlineStore(str(tmp_path / "acc"), ["key"], "first")
    epochs = [[("k", 111)], [("k", 222)], [("k", 333)]]
    for e, rows in enumerate(epochs):
        seq.multi_merge(_mk(spark, rows), epoch_id=e)
        acc.append_delta(_mk(spark, rows), epoch_id=e)
    assert _contents(acc.read(spark)) == _contents(seq.read(spark)) == {("k", 0): 111}


def test_carrier_semigroup_through_delta_log(spark, tmp_path):
    """Struct carriers (avg: s,n) through append_delta: agg_carrier folds
    within an epoch, merge_null_safe folds across epochs — identical to
    the sequential read-merge-write path."""
    seq = OnlineStore(str(tmp_path / "seq"), ["key"], "avg")
    acc = OnlineStore(str(tmp_path / "acc"), ["key"], "avg")
    lift = lambda df: df.select(  # noqa: E731
        "key", "batch_id", F.struct(F.col("delta").cast("long").alias("s"),
                        F.lit(1).cast("long").alias("n")).alias("delta")
    )
    for e, rows in enumerate(EPOCHS):
        seq.multi_merge(lift(_mk(spark, rows)), epoch_id=e)
        acc.append_delta(lift(_mk(spark, rows)), epoch_id=e)
    s = {r.key: (r.value.s, r.value.n) for r in seq.read(spark).collect()}
    a = {r.key: (r.value.s, r.value.n) for r in acc.read(spark).collect()}
    assert a == s
