"""Stateful streaming summer — exact (Option[prev], delta) semantics.

The reference's online Summer bolt (online/executor/Summer.scala:56-128)
does a batched read-modify-write (``store.multiMerge``) into an online KV
store keyed by (K, BatchID) and emits ``(K, (Option[prev], delta))`` where
``prev`` is the store value *before* this trigger's delta merged in, and a
delta is already a partial sum of the trigger's events
(map-side AsyncSummer, online/executor/FinalFlatMap.scala:54-138).

Spark-first: ``applyInPandasWithState`` with per-key state holding the
running total per open batch. Spark's shuffle groups by key (the
hash(k)%shards sharding of FinalFlatMap.scala:49-52, automatic here) and
Arrow batches the python transfer.

Scale notes: state size per key = number of open batches × value size.
With the reference's contract (a batch closes when the batch layer owns
it) pass ``evict_before_batch`` per trigger — the client-side read handles
closed batches from the offline store; this mirrors online stores expiring
old (K, BatchID) entries (ClientStore.scala onlineKeys generation).
"""

from __future__ import annotations

import pickle
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core import semigroup as sg_mod
from ..core.graph import TIME_COL


def norm_key_tuple(kt) -> tuple:
    """Normalize a pandas group key into a stable dict key: numpy scalars
    → python, and NaN (pandas' representation of a NULL group key under
    ``dropna=False``) → None. NaN must not reach a state dict key — two
    NaN objects are distinct dict keys (NaN != NaN), so a null key's
    state would silently never match across triggers."""
    out = []
    for x in kt:
        if hasattr(x, "item"):
            x = x.item()
        if x is None or (isinstance(x, float) and x != x):
            x = None
        out.append(x)
    return tuple(out)

def _delta_type(sg, value_spark_type: str) -> str:
    """prev/delta output type = the semigroup's CARRIER type (declared by
    the semigroup itself since r6 — count→bigint, set/top→array, avg/
    moments→struct; identity for sum-likes)."""
    return sg.carrier_type(value_spark_type)


def stateful_summer(
    base: DataFrame,
    keys: list[str],
    value_alias: str,
    sg,
    evict_before_batch: Optional[int] = None,
    key_buckets: Optional[int] = None,
) -> DataFrame:
    """base columns: keys..., batch_id, __time__, <value_alias>.
    Returns a streaming DataFrame (keys..., batch_id, prev, delta) with one
    row per (key, batch) per trigger that saw data for it.

    ``key_buckets``: when set, state is keyed by ``hash(keys) % buckets``
    instead of per-key — the reference's shard grouping (FinalFlatMap
    .scala:49-52 keys the Summer bolt by hash(k)%shards, not by raw key).
    applyInPandasWithState pays a fixed pandas↔Arrow + state round-trip
    PER GROUP (~3 ms measured), so per-key grouping costs |keys| such
    round-trips per trigger — at 10^8 keys that is task-hours of pure
    framework tax. Bucketed, each call amortizes over |keys|/buckets
    logical keys and the tax is O(buckets). Results are identical
    (per-key totals live inside the bucket's state dict; time-order
    within a key is preserved by the stable sort).

    Sizing: a touched bucket re-serializes its WHOLE key dict each
    trigger, so write amplification ≈ keys-per-bucket ÷ keys touched —
    the tradeoff against the per-group tax. Target ~10²-10³ logical keys
    per bucket (buckets ≈ |keys|/500), floored at a few groups per state
    partition; the default 64 fits 10³-10⁵-key streams. Hot-key caveat:
    one bucket's group is one task either way (same bound per-key mode
    has).

    Checkpoint compatibility: bucketing changes the physical state
    grouping key (key columns → ``__kb__`` bigint), so checkpoints are
    NOT portable across ``key_buckets`` settings — Spark's state-schema
    check fails loudly on restart. The planner default became 64 in r11;
    resume a pre-r11 (per-key) checkpoint with
    ``summer_key_buckets=None``."""
    if key_buckets is not None and int(key_buckets) <= 0:
        raise ValueError(f"key_buckets must be positive or None; got {key_buckets!r}")
    sg = sg_mod.get(sg)
    key_types = [(f.name, f.dataType.simpleString()) for f in base.schema.fields if f.name in keys]
    vt = base.schema[value_alias].dataType.simpleString()
    dt = _delta_type(sg, vt)
    out_schema = ", ".join(
        [f"`{n}` {t}" for n, t in key_types]
        + ["batch_id bigint", f"prev {dt}", f"delta {dt}"]
    )
    state_schema = "state binary"
    commutative = sg.commutative
    out_cols = [n for n, _ in key_types] + ["batch_id", "prev", "delta"]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        totals: dict = pickle.loads(bytes(state.get[0])) if state.exists else {}
        fresh: dict = {}
        for pdf in pdfs:
            if not commutative:
                pdf = pdf.sort_values(TIME_COL, kind="stable")
            for b, grp in pdf.groupby("batch_id", sort=True):
                d = sg.py_agg(list(grp[value_alias]))
                fresh[int(b)] = sg.py_merge(fresh[int(b)], d) if int(b) in fresh else d
        rows = []
        for b in sorted(fresh):
            prev = totals.get(b)
            totals[b] = sg.py_merge(prev, fresh[b]) if prev is not None else fresh[b]
            rows.append((*key, b, prev, fresh[b]))
        if evict_before_batch is not None:
            totals = {b: v for b, v in totals.items() if b >= evict_before_batch}
        state.update((pickle.dumps(totals),))
        yield pd.DataFrame(rows, columns=out_cols)

    if key_buckets is None:
        return base.groupBy(*keys).applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )

    key_names = [n for n, _ in key_types]

    def fn_bucketed(
        bucket, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # state: {(key_tuple, batch_id): running total} for every logical
        # key hashing into this bucket
        totals: dict = pickle.loads(bytes(state.get[0])) if state.exists else {}
        fresh: dict = {}
        for pdf in pdfs:
            # per-key mode's pdf.groupby("batch_id") silently drops
            # null-batch rows (dropna default) — match it explicitly,
            # then keep NULL KEYS (dropna=False), which Spark's own
            # groupBy(*keys) keeps in per-key mode
            pdf = pdf[pdf["batch_id"].notna()]
            if not commutative:
                pdf = pdf.sort_values(TIME_COL, kind="stable")
            # stable sort + groupby: rows within each (key, batch) group
            # keep time order, exactly as per-key mode. sort=False: group
            # emission order is fixed below by sorted(fresh) — and a
            # mixed None/str key column must not go through a group-key
            # sort (TypeError territory)
            for gk, grp in pdf.groupby(
                [*key_names, "batch_id"], sort=False, dropna=False
            ):
                *kt, b = gk if isinstance(gk, tuple) else (gk,)
                cell = (norm_key_tuple(kt), int(b))
                d = sg.py_agg(list(grp[value_alias]))
                fresh[cell] = sg.py_merge(fresh[cell], d) if cell in fresh else d
        rows = []
        for cell in sorted(fresh, key=lambda c: (repr(c[0]), c[1])):
            prev = totals.get(cell)
            totals[cell] = (
                sg.py_merge(prev, fresh[cell]) if prev is not None else fresh[cell]
            )
            rows.append((*cell[0], cell[1], prev, fresh[cell]))
        if evict_before_batch is not None:
            totals = {c: v for c, v in totals.items() if c[1] >= evict_before_batch}
        state.update((pickle.dumps(totals),))
        yield pd.DataFrame(rows, columns=out_cols)

    bucketed = base.withColumn(
        "__kb__",
        F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(int(key_buckets))),
    )
    return bucketed.groupBy("__kb__").applyInPandasWithState(
        fn_bucketed, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
