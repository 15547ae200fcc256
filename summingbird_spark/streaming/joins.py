"""Stream-stream joins — the Buffer service analog.

Reference: ``Buffer[K, V] = Service + Sink`` (Platform.scala:31) backs the
stream×stream ``leftJoin`` overload (Producer.scala:396-399): one stream
writes to the buffer while the other looks up recently-written values.
There is no Scalding implementation — it's an online-only construct.

Spark-first: Structured Streaming's stream-stream join IS this operator —
both sides buffered in the state store, bounded by watermarks, matched by
key + event-time range. The reference's "recently written" window maps to
``0 <= left_time - right_time <= window``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_time: str,
    right_time: str,
    window: str = "1 hour",
    watermark: str | None = "1 hour",
    how: str = "leftOuter",
) -> DataFrame:
    """Left stream events enriched with right-stream events of the same key
    that happened within ``window`` before them. Both sides get watermarks
    (state eviction bound); right columns keep their names, so they must
    not collide with left's (rename upstream).

    ``watermark=None`` skips the watermarks — the batch-replay form of the
    same join (plain key+time-range theta join over bounded inputs).
    """
    on = [on] if isinstance(on, str) else list(on)
    overlap = set(left.columns) & set(right.columns) - set(on)
    if overlap:
        raise ValueError(f"rename right-side columns first; colliding: {sorted(overlap)}")
    l = left.withWatermark(left_time, watermark) if watermark else left
    r = right.withWatermark(right_time, watermark) if watermark else right
    cond = None
    for k in on:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (l[left_time] >= r[right_time])
        & (l[left_time] <= r[right_time] + F.expr(f"INTERVAL {window}"))
    )
    joined = l.join(r, cond, how)
    # de-duplicate the join columns (keep left's)
    for k in on:
        joined = joined.drop(r[k])
    return joined
