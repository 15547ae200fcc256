"""Client read-side merge — the lambda-architecture serving path.

Reference: ``ClientStore.multiGet`` (summingbird-client/.../store/ClientStore.scala:123-174)
merges an offline snapshot ``K → (BatchID, V)`` with online per-batch deltas
``(K, BatchID) → V``: pivot the online batches, check contiguity (no holes
between the offline snapshot's batch and the requested batch —
ClientStore.scala:95-109), monoid-merge. Helpers in
MergeOperations.scala:47-94.

Spark-first: the merged store is a *view* — union the snapshot with the
delta log and semigroup-merge per key. No per-key driver loops; serving a
key subset is a pushed-down filter on that view.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import semigroup as sg_mod


def merge_keyed(
    frames: Sequence[DataFrame],
    key_cols: Sequence[str],
    semigroup="sum",
    value_col: str = "value",
) -> DataFrame:
    """Semigroup-merge several already-aggregated (key → value) frames.

    Full-outer joins with NULL-as-identity merge, left-to-right (order
    matters for non-commutative semigroups: pass offline first, then online
    batches in batch order — MergeOperations.mergeResults:47).
    """
    sg = sg_mod.get(semigroup)
    key_cols = list(key_cols)

    def merge2(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.withColumnRenamed(value_col, "__a__")
            .join(b.withColumnRenamed(value_col, "__b__"), key_cols, "full")
            .select(
                *key_cols,
                sg.merge_null_safe(F.col("__a__"), F.col("__b__")).alias(value_col),
            )
        )

    return reduce(merge2, frames)


def check_contiguous(offline_batch: int, online_batches: Sequence[int], through: int) -> None:
    """The ClientStore contiguity invariant (ClientStore.scala:95-109):
    online deltas must cover (offline_batch, through] with no holes."""
    need = set(range(offline_batch + 1, through + 1))
    have = set(online_batches)
    missing = sorted(need - have)
    if missing:
        raise ValueError(
            f"non-contiguous batches: offline through {offline_batch}, "
            f"requested {through}, missing online batches {missing}"
        )


def client_view(
    offline_snapshot: DataFrame,
    online_deltas: DataFrame,
    key_cols: Sequence[str],
    semigroup="sum",
    value_col: str = "value",
    offline_batch: Optional[int] = None,
    through_batch: Optional[int] = None,
) -> DataFrame:
    """The serving view: offline snapshot ⊕ online deltas per key.

    ``online_deltas`` carries CARRIER values (what an OnlineStore holds —
    already lifted by the streaming summer: count tallies, avg structs;
    for identity-lift semigroups like sum the carrier IS the raw value)
    with a ``batch_id`` column; batches ≤ offline_batch are dropped (the
    batch layer already owns them — MergeOperations.dropBatches:55), the
    rest merge in batch order. Raw per-event rows must be aggregated by a
    summer first — folding them here would mis-merge any lifted carrier.
    """
    sg = sg_mod.get(semigroup)
    key_cols = list(key_cols)
    online = online_deltas
    if "batch_id" in online.columns:
        if offline_batch is not None:
            online = online.where(F.col("batch_id") > F.lit(offline_batch))
        # the read bound applies even with no offline side (offline_batch
        # None): an empty batch layer must not expose online batches > N
        if through_batch is not None:
            online = online.where(F.col("batch_id") <= F.lit(through_batch))
    # store deltas are CARRIER values (the online summer already lifted
    # them) — fold with agg_carrier/agg_carrier_ordered, never the
    # raw-contract agg (count tallies would re-count as rows)
    if sg.commutative:
        online_total = online.groupBy(*key_cols).agg(
            sg.agg_carrier(F.col(value_col)).alias(value_col)
        )
    else:
        order = F.col("batch_id") if "batch_id" in online.columns else F.col(value_col)
        online_total = online.groupBy(*key_cols).agg(
            sg.agg_carrier_ordered(order, F.col(value_col)).alias(value_col)
        )
    return merge_keyed(
        [offline_snapshot.select(*key_cols, value_col), online_total],
        key_cols,
        sg,
        value_col,
    )
