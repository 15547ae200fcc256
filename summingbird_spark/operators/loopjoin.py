"""Loop join — a leftJoin against the store fed by this very join's output.

Reference: the StoreService *loop join* (ScaldingPlatform.scala:430-469;
validity rules scalding/Service.scala:78-105 — only value-transforms may
sit between the join output and the summer; extraction 143-183; the
per-key time-sorted ``loopJoin`` scanLeft 196-269). Each event at time t
sees the store value accumulated from *prior* events of the same key
(after their transform), i.e. a self-referential as-of join.

Spark has no built-in for a per-key sequential scan whose state is defined
by its own output, so this is the documented ``applyInPandas`` case
(SURVEY §4.5 #3): one shuffle on the key, then an ordered in-partition
scan — exactly the single reducer pass the reference plans. State is O(1)
per key; rows stream through Arrow batches.

For the *linear* special case (transform == identity, builtin semigroup)
prefer ``as_of_join(mode='sum')`` / a window running-aggregate — that stays
fully JVM-side; ``loop_join`` exists for transforms that depend on the
joined state (the general scanLeft).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import semigroup as sg_mod


def loop_join(
    df: DataFrame,
    keys: Sequence[str] | str,
    time_col: str | Sequence[str],
    value_col: str,
    out_col: str = "joined",
    semigroup="sum",
    transform: Optional[Callable] = None,
    out_type: Optional[str] = None,
) -> DataFrame:
    """Per key, in time order: emit the running store value *before* each
    row (NULL for the first), then fold the value into the store.
    ``transform=None`` folds ``py_lift(value)`` (the carrier lift — count
    folds 1, set folds {v}); a user ``transform(value, seen_state)`` sees
    the carrier-typed state and must RETURN a carrier value, which is
    merged as-is (no lift).

    Returns all input columns plus ``out_col`` (carrier-typed; override
    with ``out_type`` when a transform changes the carrier).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [time_col] if isinstance(time_col, str) else list(time_col)
    sg = sg_mod.get(semigroup)
    vt = out_type or sg.carrier_type(df.schema[value_col].dataType.simpleString())
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` {vt}"]
    )
    in_cols = [f.name for f in df.schema.fields]

    # Linear fast path: identity transform + a builtin-aggregate semigroup
    # is exactly a running aggregate over the prior rows — compile it to a
    # JVM window function (one sort-shuffle, whole-stage codegen, no
    # Python). The general state-dependent transform takes the
    # applyInPandas scan below.
    _WIN = {"sum": F.sum, "sum_long": lambda c: F.sum(c), "count": F.count,
            "min": F.min, "max": F.max}
    if transform is None and getattr(sg, "name", None) in _WIN:
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy(*keys)
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = _WIN[sg.name](F.col(value_col)).over(w)
        if sg.name == "sum_long":
            out = out.cast("long")
        if sg.name == "count":
            # scanLeft contract: NULL before the first fold (F.count over
            # an empty/all-null prior window yields 0, unlike sum/min/max
            # which yield NULL)
            out = F.when(out > 0, out)
        return df.withColumn(out_col, out)

    # General case: one shuffle on the key, keys sorted contiguously within
    # each partition, ONE Arrow scan per partition (mapInPandas) instead of
    # one per key — per-key applyInPandas pays group-invocation overhead
    # linear in |keys|, which dominates for many small keys. A key may span
    # consecutive Arrow chunks of its partition; the running (key, state)
    # carries across chunks.
    parts = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *keys, *order_cols
    )

    def _null_scalar(v) -> bool:
        # pandas shows a SQL NULL as NaN/NaT, and ``v is not None`` lets
        # it through — a lifted NaN would poison the running state where
        # the JVM fast path (F.sum over the window) skips nulls (r12
        # self-review find, same class as the streaming summer's)
        if v is None:
            return True
        try:
            import pandas as pd

            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False

    def _norm_kt(kt) -> tuple:
        # NaN != NaN would treat every row of a NULL-keyed run as a NEW
        # key and reset its state per row; normalize to None (one run),
        # matching the JVM path where partitionBy groups NULLs together
        return tuple(
            None if (x is None or (isinstance(x, float) and x != x)) else x
            for x in kt
        )

    _UNSEEN = object()  # distinct from any real key incl. all-None

    def scan_partition(chunks):
        cur_key, state = _UNSEEN, None
        for pdf in chunks:
            joined = []
            key_iter = zip(*[pdf[k] for k in keys])
            for kt, v in zip(key_iter, pdf[value_col]):
                kt = _norm_kt(kt)
                if kt != cur_key:
                    cur_key, state = kt, None
                joined.append(state)
                # identity path folds the LIFTED value (count folds 1, set
                # folds {v}, …) — py_merge is raw-safe only when the
                # carrier IS the raw type (the py_lift contract,
                # core/semigroup.py). A user transform observes the carrier
                # state and must RETURN a carrier value itself, so it is
                # merged unlifted.
                if transform is not None:
                    upd = transform(v, state)
                else:
                    upd = sg.py_lift(v) if not _null_scalar(v) else None
                if upd is not None:
                    state = upd if state is None else sg.py_merge(state, upd)
            pdf = pdf.copy()
            pdf[out_col] = joined
            yield pdf[in_cols + [out_col]]

    return parts.mapInPandas(scan_partition, schema)
