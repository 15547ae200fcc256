"""Snapshot ∪ delta-log reading and the delta-backed temporal service.

``read_delta_log`` is the reference's ``BatchedStore.readDeltaLog``
(summingbird-scalding/.../batch/BatchedStore.scala:345-352): combine the
store's LAST snapshot with the delta batches written AFTER it into one
timestamped (key, value) stream — "useful to leftJoin against a store".
Snapshot rows carry the last instant of their batch
(``batcher.latestTimeOf``: 1 ms before the next batch starts); delta rows
keep their event timestamps, so the merged stream reproduces the store's
running state at any probe time ≥ the snapshot instant.

``BatchedDeltaService`` (scalding/service/BatchedDeltaService.scala:17-60)
wraps the merged stream as a ``TemporalService(mode='sum')``: a
``left_join`` against it is ``LookupJoin.rightSumming`` over
snapshot ⊕ deltas — each probe sees the store as of its own time, without
ever scanning history the snapshot already folded.

Scale shape: the snapshot is one partition-pruned scan of the latest
version; deltas are partition-pruned to batches > last. The union feeds
the one-shuffle as-of window — no per-batch jobs, no driver state.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.graph import TIME_COL
from ..core.service import TemporalService


def read_delta_log(
    spark: SparkSession,
    store,
    deltas,
    value_col: str = "value",
    out_col: str = "state",
    time_col: str = TIME_COL,
) -> DataFrame:
    """Snapshot@last ∪ deltas-since as ONE timestamped stream.

    ``store`` is a ``VersionedBatchStore`` (snapshot side);``deltas`` a
    ``BatchedParquetSink`` (delta side, the IntermediateWrite "written
    just before the store"). Returns ``(key_cols…, out_col, time_col)``.
    With an empty store the full delta log is returned unchanged — the
    stream degenerates to plain history.
    """
    batcher = deltas.batcher
    last_snap = store.read_last(spark)
    lo = None if last_snap is None else last_snap[0] + 1
    d = deltas.read(spark, lo=lo).select(
        *store.key_cols,
        F.col(value_col).alias(out_col),
        F.col(deltas.time_col).cast("timestamp").alias(time_col),
    )
    if last_snap is None:
        return d
    last, snap = last_snap
    nxt = batcher.earliest_time_of(last + 1)
    if nxt <= batcher.earliest_time_of(last):
        raise ValueError(
            "read_delta_log needs a time-based batcher (batch id must map "
            "to a real time span; latestTimeOf is unbounded here — "
            "Batcher.scala:81 unit batcher returns Timestamp.Max)"
        )
    snap_ts = (
        nxt.astimezone(_dt.timezone.utc) - _dt.timedelta(milliseconds=1)
    ).replace(tzinfo=None)
    s = snap.select(
        *store.key_cols,
        F.col("value").alias(out_col),
        F.lit(snap_ts).cast("timestamp").alias(time_col),
    )
    return s.unionByName(d)


class BatchedDeltaService(TemporalService):
    """Temporal service over (store snapshot, delta sink): probes see
    snapshot ⊕ running deltas as of their time — the reference's
    ``BatchedDeltaService`` (rightSumming lookup over ``readDeltaLog``).

    The store's semigroup drives the fold, mirroring the reference's
    ``V: Semigroup`` bound; the sink must share the store's batcher (the
    reference asserts ``store.batcher == deltas.batcher`` — here the sink
    alone carries the batcher, so the invariant is structural).
    """

    def __init__(self, store, deltas, value_col: str = "value",
                 out_col: str = "state"):
        super().__init__(
            loader=lambda spark: read_delta_log(
                spark, store, deltas, value_col=value_col, out_col=out_col
            ),
            time_col=TIME_COL,
            mode="sum",
            semigroup=store.semigroup,
            value_cols=[out_col],
        )
        self.store = store
        self.deltas = deltas
