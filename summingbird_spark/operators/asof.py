"""Temporal (as-of) joins — the reference's service-join family.

Semantics covered (SURVEY §2.2):

* ``mode='latest'`` — BatchedService snapshot+changelog lookup
  (summingbird-scalding/.../batch/BatchedService.scala:37-99 via scalding
  ``LookupJoin``): each left event sees the latest right value with
  ``right_time <= left_time``; a NULL right value at time t is a deletion
  (key removed) per the changelog contract.
* ``mode='sum'`` — StoreService independent join
  (ScaldingPlatform.scala:402-428, scalding ``LookupJoin.rightSumming``):
  each left event sees the store's *running semigroup total* as of its
  timestamp.
* ``max_age`` — BatchedWindowService constraint ``0 <= t_l − t_r < window``
  (scalding/service/BatchedWindowService.scala:35-72). BOTH modes
  implement the reference's EXCLUSIVE upper bound: ``mode='latest'`` as a
  visibility predicate, ``mode='sum'`` as a RANGE frame over epoch
  MICROSECONDS (Spark's native timestamp resolution) with bounds
  ``[-(age_µs − 1), 0]`` — a closed frame one tick short of the window is
  exactly the half-open interval. Ages that aren't a whole number of
  microseconds are rejected rather than silently truncated.

Spark-first physical strategy: **one shuffle, no row blowup** — union both
sides tagged, then a per-key time-ordered running window (``last(...,
ignorenulls)`` / running aggregate) fills each left row with the right
state as of its time. This is the sort-merge plan a range join would need
anyway, minus the O(events × matching-history) intermediate of a
``t_r <= t_l`` theta join — at 100 TB the window scan is a single
sort-shuffle per side, which AQE can skew-split.

Ties: right rows sort before left rows at equal timestamps (inclusive
as-of). Multiple right rows per (key, time) should be pre-reduced; 'sum'
mode is naturally insensitive to right-side tie order (commutative).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core import semigroup as sg_mod

_RUNNING_AGG = {
    "sum": F.sum,
    "sum_long": lambda c: F.sum(c).cast("long"),
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_time: str,
    right_time: str,
    value_cols: Optional[Sequence[str]] = None,
    mode: str = "latest",
    semigroup="sum",
    max_age: Optional[Column] = None,
) -> DataFrame:
    """Left rows enriched with right state as-of their event time.

    Returns all left columns plus ``value_cols`` (NULL when no right row is
    visible yet / key deleted / outside ``max_age``), plus nothing else.
    """
    on = [on] if isinstance(on, str) else list(on)
    max_age_num: Optional[float] = None
    if max_age is not None and not isinstance(max_age, Column):
        max_age_num = float(max_age)
        max_age = F.lit(max_age_num)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*on, right_time)]
    value_cols = list(value_cols)

    overlap = [c for c in left.columns if c in value_cols]
    if overlap:
        raise ValueError(f"left already has columns {overlap}")

    lt = F.col(left_time).cast("timestamp")
    rt = F.col(right_time).cast("timestamp")
    # Tag and union. Right values ride inside one struct so a NULL value
    # (changelog deletion) is still an *observation* (non-null struct).
    r_payload = F.struct(*[F.col(c) for c in value_cols], rt.alias("__rt__"))
    r_tag = right.select(
        *on, rt.alias("__at__"), F.lit(0).alias("__is_left__"), r_payload.alias("__rv__")
    )
    rv_type = r_tag.schema["__rv__"].dataType.simpleString()
    l_tag = (
        left.withColumn("__at__", lt)
        .withColumn("__is_left__", F.lit(1))
        .withColumn("__rv__", F.lit(None).cast(rv_type))
    )

    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__at__").asc(), F.col("__is_left__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    if mode == "latest":
        filled = u.withColumn("__state__", F.last("__rv__", ignorenulls=True).over(w))
        out = filled.where(F.col("__is_left__") == 1)
        if max_age is not None:
            visible = F.col("__state__").isNotNull() & (
                F.col("__at__").cast("double") - F.col("__state__.__rt__").cast("double")
                < max_age.cast("double")
            )
            out = out.withColumn("__state__", F.when(visible, F.col("__state__")))
        sel = [F.col(c) for c in left.columns] + [
            F.col(f"__state__.{c}").alias(c) for c in value_cols
        ]
        return out.select(*sel)

    if mode == "sum":
        sg = sg_mod.get(semigroup)
        run_fn = _RUNNING_AGG.get(getattr(sg, "name", None))
        if max_age is None:
            frame = w
        else:
            if max_age_num is None:
                raise TypeError(
                    "mode='sum' needs max_age as a plain number of seconds "
                    "(range-frame bounds are literals, not Columns)"
                )
            max_age_us = max_age_num * 1_000_000
            if max_age_us != int(max_age_us) or int(max_age_us) < 1:
                raise ValueError(
                    "mode='sum' max_age must be a positive whole number of "
                    f"microseconds (RANGE frame bounds are longs); got "
                    f"{max_age_num!r}s — truncation would silently shrink "
                    "the window"
                )
            # The reference bound is EXCLUSIVE: 0 <= t_l - t_r < max_age
            # (BatchedWindowService.scala:35-72). A closed RANGE frame over
            # epoch microseconds with lower bound -(age_µs - 1) is exactly
            # that half-open interval at Spark's native timestamp
            # resolution — a right row at precisely t_l - max_age falls
            # one tick outside and is excluded, matching mode='latest'.
            frame = (
                Window.partitionBy(*on)
                .orderBy(F.unix_micros(F.col("__at__")))
                .rangeBetween(-(int(max_age_us) - 1), 0)
            )
        out_cols = [F.col(c) for c in left.columns]
        filled = u
        for c in value_cols:
            vc = F.col(f"__rv__.{c}")
            if run_fn is not None:
                running = run_fn(vc).over(frame)
            else:
                # collect_list skips the NULL __rv__ of interleaved left rows
                vals = F.collect_list(vc).over(frame)
                running = F.when(F.size(vals) == 0, F.lit(None)).otherwise(
                    F.aggregate(
                        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
                        F.element_at(vals, 1),
                        lambda a, b: sg.merge(a, b),
                    )
                )
            filled = filled.withColumn(f"__run_{c}__", running)
            out_cols.append(F.col(f"__run_{c}__").alias(c))
        return filled.where(F.col("__is_left__") == 1).select(*out_cols)

    raise ValueError(f"unknown as-of mode {mode!r}")
