"""Single-pass table profiling — the data-quality observability step a
corpus pipeline runs after every ingest batch.

One aggregation computes every column's stats simultaneously (ONE corpus
scan, no per-column jobs): null count, exact distinct count, min/max
(stringified for a uniform schema). The wide single-row result is then
unpivoted driver-free with ``stack`` into (column, stat...) rows.

At 100 TB the exact distinct per column is the expensive stat (one
partial-aggregated distinct per column inside the same shuffle);
``approx=True`` swaps in HLL ``approx_count_distinct`` which is purely
map-side mergeable — the profile becomes a single scan + one tiny
shuffle regardless of cardinality.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) into rows of
    ``(column, n_rows, n_null, n_distinct, min_value, max_value)`` —
    min/max cast to string so heterogeneous columns share one schema."""
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "binary")
        ]
    cols = list(cols)
    if not cols:
        raise ValueError("table_profile needs at least one column")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n__")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.count(F.when(col.isNull(), F.lit(1))).cast("long").alias(f"__null_{c}")
        )
        nd = (
            F.approx_count_distinct(col)
            if approx
            else F.countDistinct(col)
        )
        aggs.append(nd.cast("long").alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__null_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_null, n_distinct, min_value, max_value)",
        "__n__ as n_rows",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_value", "max_value")
