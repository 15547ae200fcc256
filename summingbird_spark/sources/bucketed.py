"""Bucketed (co-located) tables — shuffle-free keyed joins at scale.

The reference co-locates repeated joins by controlling reducer layout by
hand (Scalding `Grouped` reuse within one Cascading flow); Spark's durable
analog is bucketing: `bucketBy(n, key)` writes each table pre-hash-
partitioned ON DISK, and a join of two tables bucketed by the same key
and bucket count compiles to a SortMergeJoin with NO Exchange on either
side — the shuffle happened once at write time and is amortized over
every later join/aggregation on that key.

When to use at 100 TB: any dimension or store snapshot that is joined on
the same key by many downstream jobs (store snapshots joined by the
client layer, dedup-survivor id sets, IVF assignments probed by list).
Bucket count rule of thumb: total-size / target-task-size (128-512 MB),
rounded to a multiple of the cluster's executor count so every wave is
full.

Buckets are a catalog property, so tables go through ``saveAsTable`` —
pass ``path`` to keep the data external at a location you own.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str] | str,
    num_buckets: int,
    sort_cols: Optional[Sequence[str] | str] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols``. ``sort_cols``
    additionally sorts within buckets (lets the join skip its Sort too
    when it matches the join key)."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols is not None:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan reports its bucket layout to the
    planner so equi-joins/aggregations on the bucket key skip their
    Exchange."""
    return spark.table(table)
