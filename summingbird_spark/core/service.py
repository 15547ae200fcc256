"""Services — lookup tables for left joins.

The reference's ``Service[K, V]`` abstract type (Platform.scala:22-34;
memory impl Memory.scala:39-41; scalding impls Service.scala:29-54). In
Spark a service is a dimension DataFrame; small ones broadcast (the
storehaus ReadableStore multiGet analog without per-event IO —
online/FlatMapOperation.scala:101-137).

Temporal services (BatchedService snapshot+changelog as-of semantics) live
in ``operators.asof``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession


class Service:
    """A keyed lookup table. ``loader``: DataFrame | path | (spark)->DataFrame."""

    def __init__(
        self,
        loader: Union[DataFrame, str, Callable[[SparkSession], DataFrame]],
        key_cols: Optional[Sequence[str]] = None,
        broadcast: bool = True,
    ):
        self._loader = loader
        self.key_cols = list(key_cols) if key_cols else None
        self.broadcast_hint = broadcast

    def dataframe(self, spark: SparkSession) -> DataFrame:
        ld = self._loader
        if isinstance(ld, DataFrame):
            return ld
        if isinstance(ld, str):
            return spark.read.parquet(ld)
        return ld(spark)


class EmptyService(Service):
    """Always-None join (scalding/service/EmptyService.scala)."""

    def __init__(self, schema: str):
        def load(spark: SparkSession) -> DataFrame:
            return spark.createDataFrame([], schema)

        super().__init__(load)
