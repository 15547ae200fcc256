"""Sinks — pass-through side-effect writes.

Reference: ``Sink[T]`` (Platform.scala:22-34; memory ``T => Unit``
Memory.scala:48; scalding Sink.scala:19-21, BatchedSink.scala:26-60; storm
StormSink.scala). Batch: ``df.write``; streaming: ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ParquetSink:
    def __init__(self, path: str, mode: str = "overwrite", partition_by: tuple = ()):
        self.path = path
        self.mode = mode
        self.partition_by = partition_by

    def write(self, df: DataFrame) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)


class MemorySink:
    """Collects rows on the driver — tests only (reference TestSink
    scalding-test/.../TestSink.scala:1-44)."""

    def __init__(self):
        self.rows: list = []

    def write(self, df: DataFrame) -> None:
        self.rows.extend(df.collect())
