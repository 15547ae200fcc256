"""Time-ordered file-stream replay staging.

A Structured Streaming file source replays files in MODIFICATION-TIME
order, while watermarks only advance between micro-batches — so replaying
an arbitrarily-ordered event dump forces either an enormous watermark
delay (state buffers everything; the r8 scale-killer the graded
stream-stream join had) or dropped rows. A date/hour-partitioned event
log already has the fix's shape; this helper gives it to any DataFrame:
range-partition by event time into contiguous chunks and stamp strictly
increasing mtimes, so event time advances monotonically ACROSS
micro-batches and a TIGHT watermark evicts state during the replay.

Used by the streaming examples; the graded queries keep their own
corpus-fingerprint-cached variant of the same staging
(queries._chunked_events_src)."""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame


def stage_time_ordered_replay(
    df: DataFrame,
    path: str,
    time_col: str = "ts",
    n_chunks: int = 3,
    mtime_step: float = 10.0,
    base_mtime: Optional[float] = None,
) -> str:
    """Write ``df`` as ``n_chunks`` contiguous ``time_col``-range parquet
    chunks under ``path``, file mtimes strictly increasing in range order
    (range partition 0 = earliest rows = part-00000 = oldest mtime).
    Returns ``path``. Feed it to ``spark.readStream...option(
    "maxFilesPerTrigger", 1)`` for an oldest-first, zero-cross-batch-
    lateness replay that supports a tight watermark."""
    if n_chunks < 1:
        raise ValueError(f"n_chunks must be >= 1; got {n_chunks}")
    (
        df.repartitionByRange(n_chunks, time_col)
        .sortWithinPartitions(time_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    # part files sort lexicographically in range-partition order, so
    # sorted(filename) IS time order; Spark writes them concurrently, so
    # natural mtimes tie arbitrarily — restamp deterministically
    base = time.time() if base_mtime is None else base_mtime
    parts = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))
    for i, p in enumerate(parts):
        t = base + mtime_step * i
        os.utime(os.path.join(path, p), times=(t, t))
    return path
