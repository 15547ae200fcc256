"""Table sources — parquet loading with timestamp normalization.

The reference's batch sources are DateRange-driven file reads
(ScaldingPlatform.scala:160-230, TimePathedSource.scala:25-104); here a
source is a parquet scan whose event-time predicate prunes partitions /
row groups. One real-world wrinkle handled centrally: parquet
TIMESTAMP(NANOS) columns (written by arrow/pandas) are illegal for Spark's
vectorized reader, so we read them as raw nanos longs
(``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a microsecond
TimestampType column — semantics identical to DuckDB's ns→ms ``epoch_ms``.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@lru_cache(maxsize=256)
def _nanos_cols(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        inner = [p for p in os.listdir(path) if p.endswith(".parquet")]
        if not inner:
            return ()
        path = os.path.join(path, inner[0])
    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet + timestamp normalization.

    * TIMESTAMP(NANOS) → read as nanos longs, rebuild µs TimestampType;
    * TIMESTAMP_NTZ → cast to TimestampType under a pinned UTC session
      timezone, so epoch arithmetic (unix_millis etc.) is deterministic
      regardless of the host session's timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nanos_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer div: double division loses ulps at 1e18 ns magnitudes
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


# Tables whose consumers do CPU-heavy per-row work (hashing, signatures,
# decode). At production scale file count provides scan parallelism, but the
# plan must not depend on input layout: a single-file parquet scan is one
# task, which pins the whole signature stage to one core. Spread these to
# defaultParallelism up front; the shuffle moves only raw rows once and is
# dwarfed by the per-row work it parallelizes.
_CPU_HEAVY_TABLES = {"documents", "embeddings"}


@lru_cache(maxsize=256)
def _file_count(path: str) -> int:
    if os.path.isdir(path):
        return sum(1 for p in os.listdir(path) if p.endswith(".parquet"))
    return 1


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    if name in _CPU_HEAVY_TABLES:
        target = spark.sparkContext.defaultParallelism
        if _file_count(f"{sf_dir}/{name}.parquet") < target:
            df = df.repartition(target)
    return df
