"""Time-pathed sources — date-partitioned directories with availability
probing.

Reference: ``TimePathedSource`` (summingbird-scalding/.../source/
TimePathedSource.scala:25-104) globs ``path/yyyy/MM/dd/HH`` and probes
which *suffix* of the requested range actually exists on disk
(``satisfiableHdfs``:64); the planner then shrinks the requested interval
to the available one (input minification, ScaldingPlatform.scala:106-153
``minify``/``bisectingMinify``). ``RangedSource`` (summingbird-builder/
.../source/RangedSource.scala:17-36) is the date-range-driven variant.

Spark-first: directories are hive-style ``batch_id=N`` (or ``dt=...``)
partitions, so the *read* is ordinary partition pruning; what stays custom
is the planning step — ``available_batches()`` / ``shrink_interval`` —
because Spark will happily return an empty scan for missing partitions
where the reference's batch driver must instead *not commit* those batches.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.graph import TIME_COL, Source

_PART = re.compile(r"^batch_id=(-?\d+)$")


class TimePathedSource:
    """Events laid out one directory per batch: ``root/batch_id=N/<files>``.

    ``fmt`` selects the file format (``parquet`` default; ``json`` /
    ``csv`` / ``orc`` cover the reference's flat-file event logs —
    TimePathedSource.scala ingested TSV/LZO the same way: layout and
    availability probing are format-independent, only the record codec
    changes). Non-parquet formats usually want an explicit ``schema``
    (Spark SQL DDL string) and reader ``options`` (e.g. ``header="true"``
    for CSV) so the event-time column comes back typed, not inferred.
    """

    def __init__(
        self,
        root: str,
        time_col: str = "ts",
        fmt: str = "parquet",
        schema: Optional[str] = None,
        **options: str,
    ):
        self.root = root
        self.time_col = time_col
        self.fmt = fmt
        self.schema = schema
        self.options = options

    # -- probing (TimePathedSource.satisfiableHdfs analog) ---------------
    def available_batches(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for d in os.listdir(self.root):
            m = _PART.match(d)
            # a batch is available iff its dir holds at least one DATA
            # file — markers (_SUCCESS) and hidden files don't count,
            # whatever the format's part-file extension, and neither do
            # DIRECTORIES (a stray subdir — a writer's leftover temp
            # tree, a user's notes folder — holds no readable records
            # and must not mark the batch satisfiable; ADVICE r10)
            sub = os.path.join(self.root, d)
            if m and any(
                not f.startswith((".", "_"))
                and os.path.isfile(os.path.join(sub, f))
                for f in os.listdir(sub)
            ):
                out.append(int(m.group(1)))
        return sorted(out)

    def shrink_interval(self, lo: int, hi: int) -> Optional[tuple[int, int]]:
        """Largest available *prefix* of [lo, hi]: the reference plans only
        ranges whose inputs exist contiguously from the start (a hole ends
        the satisfiable range — you cannot skip a batch and stay correct).
        Returns None if even ``lo`` is missing."""
        have = set(self.available_batches())
        if lo not in have:
            return None
        b = lo
        while b + 1 <= hi and b + 1 in have:
            b += 1
        return lo, b

    # -- reading ----------------------------------------------------------
    def read(self, spark: SparkSession, lo: int, hi: int, batcher=None) -> DataFrame:
        """Partition-pruned scan of batches [lo, hi] with the event-time
        interval filter applied on top (limitTimes,
        ScaldingPlatform.scala:233-237) — partition dirs bound the files
        read; the residual predicate bounds stragglers inside them."""
        reader = spark.read.option("basePath", self.root)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.format(self.fmt).load(self.root).where(
            (F.col("batch_id") >= lo) & (F.col("batch_id") <= hi)
        )
        if batcher is not None:
            df = df.where(
                batcher.interval_predicate(F.col(self.time_col).cast("timestamp"), lo, hi + 1)
            )
        return df

    def producer(self, lo: int, hi: int, batcher=None) -> Source:
        return Source(
            lambda spark: self.read(spark, lo, hi, batcher),
            time_col=self.time_col,
            name=f"time_pathed[{self.root}]",
        )

    @staticmethod
    def write_batches(
        df: DataFrame,
        root: str,
        batcher,
        time_col: str = "ts",
        fmt: str = "parquet",
        **options: str,
    ) -> None:
        """Materialize an event table into the batch_id-partitioned layout."""
        w = (
            df.withColumn("batch_id", batcher.batch_col(F.col(time_col).cast("timestamp")))
            .write.mode("overwrite")
            .partitionBy("batch_id")
        )
        for k, v in options.items():
            w = w.option(k, v)
        w.format(fmt).save(root)
