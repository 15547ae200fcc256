"""Skew-resistant aggregation — two-phase salting for large-state monoids.

Spark's map-side partial aggregation already neutralizes hot keys for
*compact* semigroup values (sum/min/max/count: one partial row per key per
task). The remaining skew hazard is LARGE-state monoids — set union,
collect-based top-k, large sketches — where the final reducer for a hot
key must hold the merged state of every partial. Salting splits that
merge tree one level: aggregate per (key, salt), then merge the
``buckets`` bounded partials per key. This is the generalization of
``operators.topk`` and the analog of the reference's sharded summers
(``hash(k) % shards``, online/executor/FinalFlatMap.scala:49-52,
StormTopologyBuilder.scala:291-298).

AQE's skew-join handling covers joins; this covers aggregations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import semigroup as sg_mod
from ..core.graph import TIME_COL


def salted_agg(
    df: DataFrame,
    keys: Sequence[str] | str,
    value_col: str,
    semigroup,
    buckets: int = 64,
    out_col: str = "value",
    salt_col: str | None = None,
) -> DataFrame:
    """groupBy(keys) with per-(key, salt) partials then a bounded merge.

    Salt is per-row uniform (``salt_col``'s hash if given, else row
    position — never the value itself, which re-concentrates repeated hot
    values into one bucket); the semigroup must be commutative (partials
    merge in arbitrary order, and bucket assignment may vary across
    retries).
    """
    from .topk import _row_salt

    keys = [keys] if isinstance(keys, str) else list(keys)
    sg = sg_mod.get(semigroup)
    if not sg.commutative:
        raise ValueError("salted_agg needs a commutative semigroup")
    salt = _row_salt(buckets, salt_col)
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(sg.agg(F.col(value_col)).alias("__part__"))
    )
    # merge the ≤ buckets partials per key with the semigroup's merge —
    # fold over a collected (bounded!) array stays JVM-side
    parts = F.collect_list("__part__")
    merged = F.aggregate(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        F.element_at(parts, 1),
        lambda a, b: sg.merge(a, b),
    )
    return partial.groupBy(*keys).agg(merged.alias(out_col))
