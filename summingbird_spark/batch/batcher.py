"""Time → batch partitioning: Timestamp / BatchID / Batcher / intervals.

Mirrors the reference's batch module (SURVEY §1.2):
``BatchID`` (summingbird-batch/.../BatchID.scala:50-162), ``Batcher``
(summingbird-batch/.../Batcher.scala:118-226) with fixed-width
``MillisecondBatcher`` (MillisecondBatcher.scala:25-41), UTC calendar
batchers (CalendarBatcher.scala:120-124), ``CombinedBatcher``
(CombinedBatcher.scala:29), and the degenerate ``Batcher.unit``
(Batcher.scala:76-115).

Spark-first: a Batcher is a pure Column expression
``batch_col(event_time) -> LongType`` so batch assignment participates in
partition pruning and codegen; a ``batch_id`` column doubles as the
partition key of versioned stores. Interval arithmetic (the reference's
``Interval[Timestamp]`` planning currency) reduces to closed-open
``[earliest_time_of(b), earliest_time_of(b+1))`` predicates.
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

_UTC_NAMES = {"UTC", "Etc/UTC", "GMT", "Z", "+00:00"}


def ensure_utc(spark) -> None:
    """Force ``spark.sql.session.timeZone=UTC`` for batch assignment.

    ``batch_col`` mixes ``unix_millis`` (UTC instants) with naive timestamp
    literals and calendar functions (``F.year``/``F.month``), which the
    session timezone interprets; they only agree under UTC. The reference's
    batchers are UTC by construction (CalendarBatcher.scala:120-124), so
    planner/rollforward entry points call this rather than silently
    mis-assigning batches in non-UTC sessions.
    """
    if spark.conf.get("spark.sql.session.timeZone") not in _UTC_NAMES:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


class Batcher:
    """batchOf(t) as a Column expression + inverse earliest-time."""

    def batch_col(self, t: Column) -> Column:
        raise NotImplementedError

    def earliest_time_of(self, batch_id: int) -> _dt.datetime:
        raise NotImplementedError

    def batch_of(self, t: _dt.datetime) -> int:
        raise NotImplementedError

    def interval_predicate(self, t: Column, lo_batch: int, hi_batch: int) -> Column:
        """Half-open batch interval [lo, hi) as a pushdown-friendly
        event-time predicate (Batcher.scala:133-225 toInterval analog)."""
        lo = self.earliest_time_of(lo_batch)
        hi = self.earliest_time_of(hi_batch)
        return (t >= F.lit(lo.replace(tzinfo=None))) & (t < F.lit(hi.replace(tzinfo=None)))

    def upper_bound_predicate(self, t: Column, hi_batch: int) -> Column:
        """``batch_of(t) < hi_batch`` as an event-time predicate — the
        unbounded-below half of ``interval_predicate`` (the reference's
        ``toInterval`` special-cases ``Batcher.unit`` the same way,
        Batcher.scala:133-225)."""
        hi = self.earliest_time_of(hi_batch)
        return t < F.lit(hi.replace(tzinfo=None))


class MillisBatcher(Batcher):
    """Fixed-width batches (MillisecondBatcher.scala:25-41). UTC-calendar
    day/hour batchers coincide with fixed widths (ofDaysUtc/ofHoursUtc)."""

    def __init__(self, width_millis: int):
        assert width_millis > 0
        self.width = width_millis

    def batch_col(self, t: Column) -> Column:
        return F.floor(F.unix_millis(t) / F.lit(self.width)).cast("long")

    def batch_of(self, t: _dt.datetime) -> int:
        if t.tzinfo is None:
            t = t.replace(tzinfo=_dt.timezone.utc)
        return int((t - EPOCH).total_seconds() * 1000) // self.width

    def earliest_time_of(self, batch_id: int) -> _dt.datetime:
        return EPOCH + _dt.timedelta(milliseconds=batch_id * self.width)


class UnitBatcher(Batcher):
    """Single batch covering all time (Batcher.scala:76-115)."""

    def batch_col(self, t: Column) -> Column:
        return F.lit(0).cast("long")

    def batch_of(self, t) -> int:
        return 0

    def earliest_time_of(self, batch_id: int) -> _dt.datetime:
        return EPOCH

    def interval_predicate(self, t, lo_batch, hi_batch):
        return F.lit(lo_batch <= 0 < hi_batch)

    def upper_bound_predicate(self, t, hi_batch):
        # earliest_time_of is the epoch for every batch id, so the default
        # time comparison would drop ALL events; batch 0 is covered iff the
        # bound is above it.
        return F.lit(hi_batch > 0)


class CombinedBatcher(Batcher):
    """Switch batchers at a point in time (CombinedBatcher.scala:29);
    batch ids stay contiguous across the switch."""

    def __init__(self, before: Batcher, after: Batcher, switch: _dt.datetime):
        if switch.tzinfo is None:
            switch = switch.replace(tzinfo=_dt.timezone.utc)
        self.before, self.after, self.switch = before, after, switch
        self.offset = before.batch_of(switch) - after.batch_of(switch)

    def batch_col(self, t: Column) -> Column:
        sw = F.lit(self.switch.replace(tzinfo=None))
        return F.when(t < sw, self.before.batch_col(t)).otherwise(
            self.after.batch_col(t) + F.lit(self.offset)
        )

    def batch_of(self, t: _dt.datetime) -> int:
        tt = t if t.tzinfo else t.replace(tzinfo=_dt.timezone.utc)
        if tt < self.switch:
            return self.before.batch_of(t)
        return self.after.batch_of(t) + self.offset

    def earliest_time_of(self, batch_id: int) -> _dt.datetime:
        if batch_id <= self.before.batch_of(self.switch):
            return self.before.earliest_time_of(batch_id)
        return self.after.earliest_time_of(batch_id - self.offset)


class MonthBatcher(Batcher):
    """Calendar months since the epoch — truly calendar-aware (variable
    width), the CalendarBatcher case a fixed-width batcher cannot express
    (CalendarBatcher.scala:21-132)."""

    def batch_col(self, t: Column) -> Column:
        return ((F.year(t) - 1970) * 12 + F.month(t) - 1).cast("long")

    def batch_of(self, t: _dt.datetime) -> int:
        return (t.year - 1970) * 12 + t.month - 1

    def earliest_time_of(self, batch_id: int) -> _dt.datetime:
        return _dt.datetime(
            1970 + batch_id // 12, batch_id % 12 + 1, 1, tzinfo=_dt.timezone.utc
        )


class ScaledBatcher(Batcher):
    """Group ``n`` consecutive batches of an inner batcher into one —
    ``batch_id // n`` with floor semantics, how CalendarBatcher generalizes
    over ``nUnits`` (CalendarBatcher.scala:21-132)."""

    def __init__(self, inner: Batcher, n: int):
        assert n >= 1
        self.inner, self.n = inner, n

    def batch_col(self, t: Column) -> Column:
        return F.floor(self.inner.batch_col(t) / F.lit(self.n)).cast("long")

    def batch_of(self, t: _dt.datetime) -> int:
        return self.inner.batch_of(t) // self.n

    def earliest_time_of(self, batch_id: int) -> _dt.datetime:
        return self.inner.earliest_time_of(batch_id * self.n)


def of_months(n: int = 1) -> Batcher:
    """n-month calendar batches (quarters = of_months(3))."""
    return MonthBatcher() if n == 1 else ScaledBatcher(MonthBatcher(), n)


def of_millis(width: int) -> Batcher:
    return MillisBatcher(width)


def of_seconds(n: int) -> Batcher:
    return MillisBatcher(n * 1000)


def of_minutes(n: int) -> Batcher:
    return MillisBatcher(n * 60_000)


def of_hours(n: int) -> Batcher:
    """CalendarBatcher.ofHoursUtc equivalent."""
    return MillisBatcher(n * 3_600_000)


def of_days(n: int) -> Batcher:
    """CalendarBatcher.ofDaysUtc equivalent."""
    return MillisBatcher(n * 86_400_000)


UNIT = UnitBatcher()
