"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship wordcount pipeline (the reference's canonical
example job: summingbird-example/.../ExampleJob.scala:23-50 — source →
filter → flatMap tokenize → sumByKey) on sf0.001.

``queries()`` — one entry per implemented operator from SURVEY.md §2; each
callable (spark, sf_dir) -> DataFrame. ``oracle_sql()`` — the DuckDB
equivalent. Column names/aliases match exactly on both sides; double-typed
aggregates are rounded identically on both sides so value hashes are stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from summingbird_spark.queries import QUERIES, ORACLES


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
