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


class BatchedParquetSink:
    """Batched sink with replay (scalding/batch/BatchedSink.scala:26-60):
    the stream materializes once per covered batch; batches already written
    are skipped on later runs (replayed from disk, not recomputed). Layout
    matches TimePathedSource, so written streams are directly re-readable
    as batch sources."""

    def __init__(self, path: str, batcher, time_col: str = "__time__"):
        import re

        self.path = path
        self.batcher = batcher
        self.time_col = time_col
        self._pat = re.compile(r"^batch_id=(-?\d+)$")

    def written_batches(self) -> list[int]:
        import os

        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            m = self._pat.match(d)
            if m and os.path.exists(os.path.join(self.path, d, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def write(self, df: DataFrame, covered_through: int | None = None) -> None:
        """Materialize per-batch dirs for batches not yet written.

        ``covered_through`` (inclusive, e.g. the CheckpointState bound) is
        the last batch the input FULLY covers; batches above it are left
        unwritten. Without it every batch present in ``df`` is written —
        callers must then guarantee the input never covers a batch
        partially, because written batches are frozen (replayed, never
        recomputed — reference BatchedSink.scala:26-60 only writes fully
        covered batches).
        """
        from pyspark.sql import functions as F

        done = set(self.written_batches())
        withb = df.withColumn(
            "batch_id", self.batcher.batch_col(F.col(self.time_col).cast("timestamp"))
        )
        batches = [r["batch_id"] for r in withb.select("batch_id").distinct().collect()]
        todo = set(batches) - done
        if covered_through is not None:
            todo = {b for b in todo if b <= covered_through}
        for b in sorted(todo):
            withb.where(F.col("batch_id") == b).drop("batch_id").write.mode(
                "overwrite"
            ).parquet(f"{self.path}/batch_id={b}")

    def read(self, spark, lo: int = None, hi: int = None) -> DataFrame:
        from pyspark.sql import functions as F

        df = spark.read.option("basePath", self.path).parquet(self.path)
        if lo is not None:
            df = df.where(F.col("batch_id") >= lo)
        if hi is not None:
            df = df.where(F.col("batch_id") <= hi)
        return df
