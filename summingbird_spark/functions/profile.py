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
    # typed expressions throughout — no SQL-string interpolation, so
    # column names containing quotes/backticks/dots are fine (ADVICE r5):
    # source refs are backtick-quoted with doubled inner backticks (the
    # one escape F.col honors), internal aliases are INDEX-keyed, and the
    # unpivot is explode(array(struct...)) — the same single-pass plan
    # shape as stack()
    def _q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    aggs = [F.count(F.lit(1)).cast("long").alias("__n__")]
    for i, c in enumerate(cols):
        col = F.col(_q(c))
        aggs.append(
            F.count(F.when(col.isNull(), F.lit(1))).cast("long").alias(f"__null_{i}")
        )
        nd = (
            F.approx_count_distinct(col)
            if approx
            else F.countDistinct(col)
        )
        aggs.append(nd.cast("long").alias(f"__nd_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{i}").alias("n_null"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_value"),
                F.col(f"__max_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        wide.select(F.col("__n__").alias("n_rows"), F.explode(entries).alias("__e__"))
        .select(
            "__e__.column", "n_rows", "__e__.n_null", "__e__.n_distinct",
            "__e__.min_value", "__e__.max_value",
        )
    )
