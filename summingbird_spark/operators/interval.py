"""General interval (range) join: match left events to right validity
windows  ``right_start <= left_time < right_end`` on an equality key.

The reference's only windowed join is the as-of variant
(BatchedWindowService.scala:35-72, implemented in operators/asof.py);
this is the general case — arbitrary, possibly overlapping windows, each
event matching every window that covers it.

Spark has no native range join, and the naive formulation
``join(key) .where(start <= t AND t < end)`` degenerates to a per-key
theta join: every event pairs with every window of its key before the
filter runs — O(|events| × windows-per-key) intermediate rows, the exact
blowup the as-of operator exists to avoid.

The scale-safe plan is the standard CHUNKED EQUI-JOIN: pick a chunk
width, explode each window to the chunks it covers (fan-out =
⌈len/chunk⌉ + 1, bounded and known), bucket each event into its single
chunk, equi-join on (key, chunk) — Catalyst sees a plain shuffled hash
join on uniform keys, AQE handles skew — then apply the residual range
predicate. Every (event, window) pair meets in exactly ONE chunk (the
event's), so no dedup pass is needed. Choose ``chunk_seconds`` near the
typical window length: shorter chunks raise window fan-out, longer
chunks raise residual-filter waste; both degrade gracefully.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_time: str,
    right_start: str,
    right_end: str,
    how: str = "inner",
    chunk_seconds: int = 86400,
) -> DataFrame:
    """Join each left row to every right row whose half-open validity
    window ``[right_start, right_end)`` covers ``left_time``, equal on
    ``on``. ``how`` is ``inner`` or ``left`` (left rows covered by no
    window keep NULL right columns — each such row appears exactly once).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left'; got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    # non-key column names must be disjoint: the inner path's residual
    # predicate references them unqualified (ambiguous otherwise), and the
    # outer path's final projection would silently drop right-side
    # duplicates — fail loudly instead (ADVICE r5; rename upstream)
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"interval_join: rename colliding non-key columns first: {sorted(overlap)}"
        )

    c_us = F.lit(int(chunk_seconds) * 1_000_000)  # long literal, no int overflow
    l_chunk = F.floor(F.unix_micros(F.col(left_time)) / c_us)
    r_lo = F.floor(F.unix_micros(F.col(right_start)) / c_us)
    # half-open end: the chunk of (end − 1µs); empty/negative windows
    # yield a descending (hi < lo) range -> sequence would throw, so
    # guard them out (they can match nothing anyway)
    r_hi = F.floor((F.unix_micros(F.col(right_end)) - F.lit(1)) / c_us)
    r = right.where(F.col(right_start) < F.col(right_end)).withColumn(
        "__chunk__", F.explode(F.sequence(r_lo, r_hi))
    )
    l = left.withColumn("__chunk__", l_chunk)
    cond = (
        (F.col(right_start) <= F.col(left_time))
        & (F.col(left_time) < F.col(right_end))
    )
    joined = l.join(r, on + ["__chunk__"], how) if how == "inner" else None
    if how == "inner":
        return joined.where(cond).drop("__chunk__")
    # left outer: fold the residual INTO the join condition so unmatched
    # left rows surface with NULLs exactly once (their chunk is unique)
    lr = l.alias("l")
    rr = r.alias("r")
    full_cond = F.lit(True)
    for k in on:
        full_cond = full_cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    full_cond = (
        full_cond
        & (F.col("l.__chunk__") == F.col("r.__chunk__"))
        & (F.col(f"r.{right_start}") <= F.col(f"l.{left_time}"))
        & (F.col(f"l.{left_time}") < F.col(f"r.{right_end}"))
    )
    out = lr.join(rr, full_cond, "left")
    keep = [F.col(f"l.{c_}") for c_ in left.columns] + [
        F.col(f"r.{c_}") for c_ in right.columns if c_ not in left.columns
    ]
    return out.select(*keep)
