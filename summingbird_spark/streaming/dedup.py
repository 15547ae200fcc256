"""Streaming deduplication — exact dedup over unbounded streams.

Batch dedup (functions.dedup) assumes a bounded corpus; streams need
bounded STATE. Two policies:

* ``dedup_stream(..., watermark=...)`` — drop duplicates whose first
  occurrence is within the watermark horizon
  (``dropDuplicatesWithinWatermark``): state is bounded by the horizon,
  late re-occurrences beyond it pass through (at-least-once dedup — the
  batch layer's exact dedup reconciles, the same lambda split the
  reference uses for everything else).
* ``dedup_stream(..., watermark=None)`` — exact global dedup with
  unbounded state (``dropDuplicates``): only for keyspaces known to be
  bounded (e.g. content digests of a capped catalog).

Dedup key defaults to a content digest so state rows are ~32 bytes, not
documents.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: Optional[str] = None,
    key_cols: Optional[Sequence[str]] = None,
    time_col: Optional[str] = None,
    watermark: Optional[str] = "1 hour",
) -> DataFrame:
    """Keep the first occurrence per digest/key within the state horizon."""
    if (text_col is None) == (key_cols is None):
        raise ValueError("exactly one of text_col / key_cols")
    df = stream
    if text_col is not None:
        df = df.withColumn("__digest__", F.md5(F.col(text_col)))
        keys = ["__digest__"]
    else:
        keys = list(key_cols)
    if watermark is not None:
        if time_col is None:
            raise ValueError("watermark dedup needs time_col")
        df = df.withWatermark(time_col, watermark)
        out = df.dropDuplicatesWithinWatermark(keys)
    else:
        out = df.dropDuplicates(keys)
    return out.drop("__digest__") if text_col is not None else out
