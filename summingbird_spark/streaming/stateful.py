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

import logging
import pickle
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core import semigroup as sg_mod
from ..core.graph import TIME_COL

_LOG = logging.getLogger(__name__)


class _NanKeyType:
    """Pickle-stable singleton marking a float NaN KEY VALUE in bucketed
    state dicts. pandas represents both SQL NULL and a real NaN key as
    NaN, but Spark's own groupBy keeps them distinct groups — the
    ``__knan_*__`` companion flags (``bucket_by_key_hash``) carry the
    distinction into the kernel and this sentinel carries it through the
    pickled state dict (ADVICE r11)."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "<nan-key>"

    def __reduce__(self):
        return (_NanKeyType, ())


NAN_KEY = _NanKeyType()

# exact-integer range of float64: a nullable integral key column that
# pandas coerced to float64 is only faithful inside ±2^53
_F64_EXACT_INT = 2.0 ** 53


def norm_key_tuple(kt) -> tuple:
    """Normalize a pandas group key into a stable dict key: numpy scalars
    → python, and NaN (pandas' representation of a NULL group key under
    ``dropna=False``) → None. NaN must not reach a state dict key — two
    NaN objects are distinct dict keys (NaN != NaN), so a null key's
    state would silently never match across triggers. (A float NaN KEY
    VALUE — distinct from NULL — is substituted with ``NAN_KEY`` by the
    callers BEFORE this runs, via the companion flags.)"""
    out = []
    for x in kt:
        if hasattr(x, "item"):
            x = x.item()
        if x is None or (isinstance(x, float) and x != x):
            x = None
        out.append(x)
    return tuple(out)


def bucket_by_key_hash(df: DataFrame, keys: list[str], key_buckets: int):
    """Attach the physical bucket column ``__kb__ = xxhash64(keys) %
    buckets`` plus, for every float/double key column, a boolean
    ``__knan_<k>__`` companion so the kernel can tell a NaN key value
    from NULL after pandas conflates both to NaN (ADVICE r11). NaN is
    normalized to NULL inside the hash so NaN- and NULL-keyed rows land
    in the SAME bucket (they would otherwise hash apart and each emit a
    NULL-keyed output row); the companion flag keeps them distinct
    LOGICAL keys there — exactly the two groups Spark's own groupBy
    produces in per-key mode.

    Returns ``(df2, flag_names, flagged_pos)``: the flag column names
    (order-aligned with ``flagged_pos``, positions into ``keys``).
    """
    from pyspark.sql.types import DoubleType, FloatType

    flag_names: list[str] = []
    flagged_pos: list[int] = []
    hash_exprs = []
    for i, k in enumerate(keys):
        if isinstance(df.schema[k].dataType, (DoubleType, FloatType)):
            fc = f"__knan_{k}__"
            # isnan is non-nullable: false on NULL, true only on real NaN
            df = df.withColumn(fc, F.isnan(F.col(k)))
            flag_names.append(fc)
            flagged_pos.append(i)
            hash_exprs.append(
                F.when(F.isnan(F.col(k)), F.lit(None)).otherwise(F.col(k))
            )
        else:
            hash_exprs.append(F.col(k))
    df = df.withColumn(
        "__kb__", F.pmod(F.xxhash64(*hash_exprs), F.lit(int(key_buckets)))
    )
    return df, flag_names, flagged_pos


def integral_key_cols(df: DataFrame, keys: list[str]) -> list[str]:
    """Key columns whose Spark type is integral — the ones pandas coerces
    to float64 whenever a micro-batch carries a NULL for them."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return [
        k for k in keys
        if isinstance(df.schema[k].dataType,
                      (ByteType, ShortType, IntegerType, LongType))
    ]


def guard_int_keys(
    pdf: pd.DataFrame, int_keys: list[str], int_values: list[str] = ()
) -> None:
    """Fail loudly where silent corruption would start: a nullable
    integral column arrives in pandas as float64 when the batch also
    carries a NULL for it, and values beyond ±2^53 are already rounded by
    that conversion (ADVICE r11). For KEY columns that means wrong state
    identity and wrong emitted keys — per-key mode never round-trips keys
    through pandas, so the error names that escape hatch. For sum_long
    VALUE columns (``int_values``) it means wrong sums where the batch
    planner's JVM F.sum is exact — both per-key and bucketed kernels read
    values through pandas, so the remedy is upstream (no same-batch
    NULLs, or a decimal/string carrier)."""
    import numpy as np

    def _max_exceeds(col) -> bool:
        if col.dtype.kind != "f":
            return False
        vals = col.to_numpy()
        finite = np.isfinite(vals)
        return bool(
            finite.any()
            and float(np.abs(vals[finite]).max()) >= _F64_EXACT_INT
        )

    for k in int_keys:
        if _max_exceeds(pdf[k]):
            raise ValueError(
                f"bucketed streaming state: integral key column {k!r} holds "
                "values at or beyond 2^53 in a micro-batch that also carries "
                "NULLs for it — the Arrow→pandas float64 round-trip corrupts "
                "such keys silently. Use key_buckets=None (per-key state "
                "never passes keys through pandas) for this stream."
            )
    for c in int_values:
        if _max_exceeds(pdf[c]):
            raise ValueError(
                f"streaming stateful kernel: integral value column {c!r} "
                "holds values at or beyond 2^53 in a micro-batch that also "
                "carries NULLs for it — the Arrow→pandas float64 round-trip "
                "corrupts such values silently (the batch planner's JVM "
                "aggregation is exact). Keep NULLs out of this column's "
                "micro-batches or use a decimal carrier."
            )


def sentinel_key_tuple(kvals, fvals, flagged_pos) -> tuple:
    """Build the state-dict key for one logical key: substitute NAN_KEY
    where a companion flag marks a true float NaN (vs NULL), then apply
    ``norm_key_tuple``'s numpy/NaN→None normalization to the rest."""
    kt = list(kvals)
    for p, fv in zip(flagged_pos, fvals):
        if fv:
            kt[p] = NAN_KEY
    return norm_key_tuple(tuple(kt))


def emit_key_values(kt) -> tuple:
    """Inverse of ``sentinel_key_tuple`` for kernels that EMIT the key
    columns (the summer): NAN_KEY → float NaN, everything else verbatim."""
    return tuple(float("nan") if v is NAN_KEY else v for v in kt)


#: auto-sizing targets (measured, SCALING.md r12): ~500 logical keys per
#: bucket balances the ~3 ms/group framework tax against whole-dict
#: write amplification; floor 8 keeps small streams spread over state
#: partitions; cap 4096 groups per state partition bounds the per-trigger
#: group count (the tax) even at 10⁹ keys.
#: target ~100 keys per bucket (r13 re-tune): the r12 amplification
#: table's WALL column dips at 64-256 buckets for a 5k keyset (~20-80
#: keys/bucket) and a controlled sf0.1 A/B read 8 buckets ~5-10% slower
#: than 32/64 for a ~3.5k keyset; bytes/trigger at 10% key-touch barely
#: moves 16→256 buckets (18-22 KB), so wall decides. The r12 value (500)
#: optimized amplification alone.
AUTO_KEYS_PER_BUCKET = 100
AUTO_MIN_BUCKETS = 8
AUTO_GROUPS_PER_PARTITION_CAP = 4096


def auto_key_buckets(
    batch_df: DataFrame,
    keys: list[str],
    state_partitions: int,
    target_keys_per_bucket: int = AUTO_KEYS_PER_BUCKET,
) -> int:
    """Derive the physical state-bucket count from measured key
    cardinality — the analog of the reference sizing Summer shards from
    parallelism × SummerBatchMultiplier (StormTopologyBuilder.scala:
    291-298), except data-driven: ``buckets = clamp(distinct_keys /
    target, AUTO_MIN_BUCKETS, state_partitions × 4096)``.

    ``batch_df`` is the BATCH twin of the stream (plan-time static probe;
    one column-pruned scan of the key columns — approx_count_distinct
    never shuffles raw rows). Too few buckets and a touched bucket
    rewrites a huge key dict per trigger (write amplification ≈
    keys-per-bucket ÷ keys-touched); too many and the per-group
    pandas↔Arrow round-trip tax returns. See SCALING.md for the measured
    tradeoff table."""
    n = batch_df.agg(
        F.approx_count_distinct(F.struct(*[F.col(k) for k in keys])).alias("n")
    ).first()["n"] or 0
    want = -(-int(n) // max(1, int(target_keys_per_bucket)))  # ceil
    cap = max(AUTO_MIN_BUCKETS,
              int(state_partitions) * AUTO_GROUPS_PER_PARTITION_CAP)
    return max(AUTO_MIN_BUCKETS, min(want, cap))

def _delta_type(sg, value_spark_type: str) -> str:
    """prev/delta output type = the semigroup's CARRIER type (declared by
    the semigroup itself since r6 — count→bigint, set/top→array, avg/
    moments→struct; identity for sum-likes)."""
    return sg.carrier_type(value_spark_type)


def _scalar(v):
    """numpy scalar → python (dict/state values must pickle stably and
    compare across triggers)."""
    return v.item() if hasattr(v, "item") else v


def _fa_scalar(pd_agg, conv):
    """Single-series C-speed aggregation: ``pd_agg`` runs one pandas
    groupby reduction, ``conv`` maps each group's result to the carrier
    (or None for an all-null group)."""

    def run(pdf: pd.DataFrame, gcols: list, vcol: str, v_int: bool):
        s = pd_agg(pdf.groupby(gcols, sort=False, dropna=False)[vcol])
        for k, v in s.items():
            yield k, conv(v)

    return run


def _fa_avg(pdf: pd.DataFrame, gcols: list, vcol: str, v_int: bool):
    """avg carrier {s, n} from ONE pandas groupby pass (sum + count) —
    no per-row py_lift/py_merge dict fold. Exact for integral value
    columns (the graded integer-cents case: integer sums are order-free;
    the ±2^53 float64 guard already rejects the one corruptible shape).
    For float columns pandas' pairwise sum differs from the sequential
    fold only at the last ulp — the same nondeterminism the BATCH
    planner's JVM ``F.sum`` already has across partition orders, and the
    pinned parity contract rounds doubles before comparing
    (test_stream_lifted_carriers_match_batch)."""
    gb = pdf.groupby(gcols, sort=False, dropna=False)[vcol]
    s = gb.sum(min_count=1)
    n = gb.count().to_numpy()
    cast = int if v_int else float
    for (k, sv), nv in zip(s.items(), n):
        yield k, (None if nv == 0 else {"s": cast(sv), "n": int(nv)})


def _fa_moments(pdf: pd.DataFrame, gcols: list, vcol: str, v_int: bool):
    """moments power-sum carrier {n, s1..s4} via vectorized elementwise
    powers + one grouped column sum. Same rounding contract as ``_fa_avg``
    (power sums of integer-valued inputs stay exact below 2^53; float
    inputs were never bitwise-reproducible across engines — batch F.sum
    partition order is nondeterministic and parity rounds)."""
    x = pdf[vcol].astype("float64")
    tmp = pdf[gcols].copy()
    x2 = x * x
    tmp["__s1"] = x
    tmp["__s2"] = x2
    tmp["__s3"] = x2 * x
    tmp["__s4"] = x2 * x2
    g = tmp.groupby(gcols, sort=False, dropna=False)
    n = g["__s1"].count().to_numpy()
    s = g[["__s1", "__s2", "__s3", "__s4"]].sum(min_count=1)
    for (k, s1, s2, s3, s4), nv in zip(s.itertuples(name=None), n):
        yield k, (
            None if nv == 0 else
            {"n": int(nv), "s1": float(s1), "s2": float(s2),
             "s3": float(s3), "s4": float(s4)}
        )


#: C-speed pandas groupby replacements for the per-group python fold —
#: each entry is ``fn(pdf, gcols, vcol, v_int) -> iter[(group_key,
#: carrier-or-None)]`` with SQL null-skipping semantics (all-null group →
#: None, matching ``_agg_group``). sum/count/min/max are exact regardless
#: of evaluation order for any value dtype, so they agree with the fold
#: bitwise; avg/moments (r13) pin parity at double rounding instead —
#: exact for integral inputs, last-ulp for floats, identical to the batch
#: planner's own JVM-partition-order nondeterminism. They are the map-side
#: AsyncSummer analog: the summer must never fold per-event at the sink
#: (reference online/executor/FinalFlatMap.scala:54-138).
_PANDAS_FAST_AGG = {
    "sum_long": _fa_scalar(
        lambda gb: gb.sum(min_count=1),
        lambda v: None if pd.isna(v) else int(v),
    ),
    "count": _fa_scalar(
        lambda gb: gb.count(),
        lambda v: int(v) if v > 0 else None,
    ),
    "min": _fa_scalar(
        lambda gb: gb.min(),
        lambda v: None if pd.isna(v) else _scalar(v),
    ),
    "max": _fa_scalar(
        lambda gb: gb.max(),
        lambda v: None if pd.isna(v) else _scalar(v),
    ),
    "avg": _fa_avg,
    "moments": _fa_moments,
}

#: fast-agg members whose carrier math runs in float64 — dispatched only
#: for integral/float value columns (a decimal column keeps the exact
#: python fold; float() would silently change its type and precision).
_FAST_AGG_NUMERIC_ONLY = {"avg", "moments"}


def resolve_fast_agg(sg, base: DataFrame, value_alias: str):
    """Pick the C-speed kernel for this (semigroup, value dtype), or None
    to keep the general python fold. Returns ``(fn, v_int)``."""
    from pyspark.sql.types import DoubleType, FloatType

    name = getattr(sg, "name", None)
    fa = _PANDAS_FAST_AGG.get(name)
    v_int = bool(integral_key_cols(base, [value_alias]))
    if fa is not None and name in _FAST_AGG_NUMERIC_ONLY:
        v_float = isinstance(
            base.schema[value_alias].dataType, (FloatType, DoubleType)
        )
        if not (v_int or v_float):
            fa = None
    return fa, v_int


def validate_bootstrap_dir(
    bootstrap_dir, key_buckets, spark=None, key_types=None, kind=None
) -> None:
    """Driver-side checks shared by every kernel that accepts a
    ``bootstrap_dir`` (summer, temporal as-of, self-loop).

    With a ``spark`` session the check goes through the Hadoop
    FileSystem API (so scheme'd URIs are verified too, not skipped) and
    reads the export's ``_manifest.json``: a ``key_buckets`` that
    differs from the manifest's ``new_key_buckets`` would find each
    carried-in cell only where ``hash%new == hash%export`` coincide — a
    silent PARTIAL carry-in, the exact corruption bootstrap exists to
    avoid — so the mismatch raises naming both counts (VERDICT r14;
    the reference pins one shard layout per topology,
    summingbird-storm/.../StormTopologyBuilder.scala:291-298).
    ``key_types`` ([(name, simpleString)] in the kernel's hash order)
    and ``kind`` ("summer" | "keyed") are verified the same way:
    xxhash64 is type-sensitive, so a type drift mis-routes every key,
    and a summer export seeded into a keyed kernel (or vice versa)
    unpickles the wrong state class.
    """
    if bootstrap_dir is None:
        return
    if key_buckets is None:
        raise ValueError(
            "bootstrap_dir requires bucketed state (an int key_buckets "
            "matching the export's new_key_buckets); per-key mode has "
            "one state group per key — re-run the export at a bucket "
            "count instead"
        )
    if spark is None:
        import os as _os

        if "://" not in str(bootstrap_dir) and not _os.path.isdir(
            str(bootstrap_dir)
        ):
            raise ValueError(
                f"bootstrap_dir {bootstrap_dir!r} does not exist — a "
                "mistyped path would silently start from empty state"
            )
        return

    from .state_tools import read_bootstrap_manifest

    manifest = read_bootstrap_manifest(spark, bootstrap_dir)
    if manifest is None:
        # pre-manifest (r14) export: the dir exists but its layout
        # cannot be verified — keep working, but say so
        _LOG.warning(
            "bootstrap_dir %s has no _manifest.json (pre-r15 export): "
            "cannot verify its bucket count matches key_buckets=%s — "
            "re-run the export to pin the layout",
            bootstrap_dir, key_buckets,
        )
        return
    if int(manifest["new_key_buckets"]) != int(key_buckets):
        raise ValueError(
            f"bootstrap_dir {bootstrap_dir!r} was exported at "
            f"new_key_buckets={manifest['new_key_buckets']} but this "
            f"kernel resolved key_buckets={int(key_buckets)} — a "
            "mismatched layout seeds each key only where both hashes "
            "coincide (silent partial state). Start the new generation "
            f"with key_buckets={manifest['new_key_buckets']}, or re-run "
            "the export at the desired count."
        )
    if kind is not None and manifest.get("kind") not in (None, kind):
        raise ValueError(
            f"bootstrap_dir {bootstrap_dir!r} holds a "
            f"{manifest['kind']!r} export but this is a {kind!r} kernel "
            "— the carried state blobs would unpickle as the wrong "
            "state class. Point each kernel at its own export."
        )
    mf = manifest.get("key_schema_fields")
    if key_types is not None and mf is not None:
        got = [t for _, t in key_types]
        exp = [t for _, t in mf]
        if got != exp:
            raise ValueError(
                f"bootstrap_dir {bootstrap_dir!r} was exported with key "
                f"schema {mf} but this kernel hashes keys as "
                f"{[list(kt) for kt in key_types]} — xxhash64 is "
                "type-sensitive, so a type or order drift re-routes "
                "every key. Re-run the export with this kernel's exact "
                "key types (in its key order)."
            )
        names = [n for n, _ in key_types]
        if names != [n for n, _ in mf]:
            _LOG.warning(
                "bootstrap_dir %s key names %s differ from the export's "
                "%s (types match — routing is unaffected, but verify "
                "the rename is intentional: cell identity is positional)",
                bootstrap_dir, names, [n for n, _ in mf],
            )


def _load_bootstrap_bucket(bootstrap_dir: str, bucket: int) -> dict:
    """Worker-side load of one bucket's carried-in state cells from a
    ``state_tools.export_summer_bootstrap`` layout
    (``<dir>/__kb__=<bucket>/*.parquet`` of pickled (cell, total) pairs).
    A missing partition dir = an empty bucket (hash gaps are normal);
    any OTHER read error propagates — silently dropping carried-in
    totals would be the exact corruption bootstrap exists to avoid."""
    import os

    import pyarrow.parquet as pq

    part = os.path.join(bootstrap_dir, f"__kb__={bucket}")
    try:
        t = pq.read_table(part, columns=["cell", "total"])
    except FileNotFoundError:
        return {}
    return {
        pickle.loads(bytes(c)): pickle.loads(bytes(v))
        for c, v in zip(
            t.column("cell").to_pylist(), t.column("total").to_pylist()
        )
    }


def stateful_summer(
    base: DataFrame,
    keys: list[str],
    value_alias: str,
    sg,
    evict_before_batch: Optional[int] = None,
    key_buckets: Optional[int] = None,
    bootstrap_dir: Optional[str] = None,
) -> DataFrame:
    """base columns: keys..., batch_id, __time__, <value_alias>.
    Returns a streaming DataFrame (keys..., batch_id, prev, delta) with one
    row per (key, batch) per trigger that saw data for it.

    ``bootstrap_dir``: replay-free state carry-in for a FRESH checkpoint
    (the re-bucket migration path): each bucket's FIRST trigger — the
    one with no committed state yet — seeds its totals from
    ``<bootstrap_dir>/__kb__=<bucket>/`` (written by
    ``state_tools.export_summer_bootstrap`` at THIS bucket count), so
    ``prev`` values continue from the exported generation without
    replaying its corpus. Exactly-once by construction: after the first
    commit the state exists and the bootstrap is never re-read, and an
    epoch replayed after a crash-before-commit re-reads it idempotently.
    Requires bucketed mode (an int ``key_buckets`` matching the export).
    The dir must be reachable from the workers (shared filesystem, or
    any URI pyarrow can open).

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
    per bucket (buckets ≈ |keys|/100), floored at a few groups per state
    partition; the default 64 fits 10³-10⁵-key streams. Hot-key caveat:
    one bucket's group is one task either way (same bound per-key mode
    has).

    Checkpoint compatibility: bucketing changes the physical state
    grouping key (key columns → ``__kb__`` bigint), so checkpoints are
    NOT portable across ``key_buckets`` settings — Spark's state-schema
    check fails loudly on restart. The planner default became 64 in r11;
    resume a pre-r11 (per-key) checkpoint with
    ``summer_key_buckets=None``."""
    if key_buckets == "auto":
        raise ValueError(
            "key_buckets='auto' is resolved by StreamPlanner (it needs the "
            "source's batch twin for the cardinality probe); pass an int "
            "here, or plan through StreamPlanner(summer_key_buckets='auto')"
        )
    if key_buckets is not None and int(key_buckets) <= 0:
        raise ValueError(f"key_buckets must be positive or None; got {key_buckets!r}")
    validate_bootstrap_dir(
        bootstrap_dir, key_buckets, spark=base.sparkSession,
        key_types=[(k, base.schema[k].dataType.simpleString()) for k in keys],
        kind="summer",
    )
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
    fast_agg, value_is_int = resolve_fast_agg(sg, base, value_alias)

    def _null_scalar(v) -> bool:
        if v is None:
            return True
        try:
            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False  # array-like raw value — never a SQL NULL

    def _agg_group(vals):
        """SQL-aggregate semantics over one (key, batch) group's raw
        values: NULLs are SKIPPED (batch F.sum/collect do), and an
        all-null group aggregates to None — delta row emitted, state
        untouched. Folding the raw pandas column instead (the pre-r12
        behavior) let a NaN-represented NULL propagate through py_merge
        and silently POISON the running total: batch said sum=5, the
        stream said NULL forever after (r12 self-review find, pinned by
        test_summer_null_values_match_batch_sql)."""
        vals = [v for v in vals if not _null_scalar(v)]
        return sg.py_agg(vals) if vals else None

    def _merge_fresh(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return sg.py_merge(a, b)

    def _emit(fresh: dict, totals: dict, make_row, sort_key=None) -> list:
        """Shared (prev, delta) emission: delta may be None (all-null
        group — row still emitted, matching the batch planner's NULL-sum
        row); state advances only on non-null deltas."""
        rows = []
        for cell in sorted(fresh, key=sort_key):
            prev = totals.get(cell)
            d = fresh[cell]
            if d is not None:
                totals[cell] = sg.py_merge(prev, d) if prev is not None else d
            rows.append(make_row(cell, prev, d))
        return rows

    int_vals = integral_key_cols(base, [value_alias])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        totals: dict = pickle.loads(bytes(state.get[0])) if state.exists else {}
        fresh: dict = {}
        for pdf in pdfs:
            guard_int_keys(pdf, [], int_vals)
            if fast_agg is not None:
                # C-speed per-batch aggregation (sum/count/min/max/avg/
                # moments) with SQL null-skipping semantics — kills the
                # per-ROW python fold on hot keys. The explicit notna
                # filter preserves the slow path's silent drop of
                # null-batch rows (its groupby defaults to dropna).
                pdf = pdf[pdf["batch_id"].notna()]
                for b, v in fast_agg(pdf, ["batch_id"], value_alias,
                                     value_is_int):
                    fresh[int(b)] = _merge_fresh(fresh.get(int(b)), v)
                continue
            if not commutative:
                pdf = pdf.sort_values(TIME_COL, kind="stable")
            for b, grp in pdf.groupby("batch_id", sort=True):
                d = _agg_group(list(grp[value_alias]))
                fresh[int(b)] = _merge_fresh(fresh.get(int(b)), d)
        rows = _emit(fresh, totals, lambda b, prev, d: (*key, b, prev, d))
        if evict_before_batch is not None:
            totals = {b: v for b, v in totals.items() if b >= evict_before_batch}
        state.update((pickle.dumps(totals),))
        yield pd.DataFrame(rows, columns=out_cols)

    if key_buckets is None:
        return base.groupBy(*keys).applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )

    key_names = [n for n, _ in key_types]
    bucketed, flag_names, flagged_pos = bucket_by_key_hash(
        base, key_names, int(key_buckets)
    )
    int_keys = integral_key_cols(base, key_names)
    nk = len(key_names)

    def fn_bucketed(
        bucket, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # state: {(key_tuple, batch_id): running total} for every logical
        # key hashing into this bucket
        if state.exists:
            totals: dict = pickle.loads(bytes(state.get[0]))
        elif bootstrap_dir is not None:
            # fresh checkpoint carry-in (re-bucket migration): seed this
            # bucket from the exported generation's totals
            totals = _load_bootstrap_bucket(str(bootstrap_dir), int(bucket[0]))
        else:
            totals = {}
        fresh: dict = {}
        gcols = [*key_names, *flag_names, "batch_id"]

        def cell_of(gk):
            gk = gk if isinstance(gk, tuple) else (gk,)
            kvals, fvals, b = gk[:nk], gk[nk:-1], gk[-1]
            return (sentinel_key_tuple(kvals, fvals, flagged_pos), int(b))

        for pdf in pdfs:
            guard_int_keys(pdf, int_keys, int_vals)
            # per-key mode's pdf.groupby("batch_id") silently drops
            # null-batch rows (dropna default) — match it explicitly,
            # then keep NULL KEYS (dropna=False), which Spark's own
            # groupBy(*keys) keeps in per-key mode
            pdf = pdf[pdf["batch_id"].notna()]
            if fast_agg is not None:
                # one C-speed groupby aggregation over the whole bucket —
                # no per-key sub-frame materialization, no per-row python
                # fold; SQL null-skipping semantics (all-null → None)
                for gk, v in fast_agg(pdf, gcols, value_alias,
                                      value_is_int):
                    cell = cell_of(gk)
                    fresh[cell] = _merge_fresh(fresh.get(cell), v)
                continue
            if not commutative:
                pdf = pdf.sort_values(TIME_COL, kind="stable")
            # stable sort + groupby: rows within each (key, batch) group
            # keep time order, exactly as per-key mode. sort=False: group
            # emission order is fixed below by sorted(fresh) — and a
            # mixed None/str key column must not go through a group-key
            # sort (TypeError territory). The __knan__ companions ride in
            # the group key so a NaN key and a NULL key stay distinct
            # logical groups (pandas shows both as NaN).
            for gk, grp in pdf.groupby(gcols, sort=False, dropna=False):
                cell = cell_of(gk)
                d = _agg_group(list(grp[value_alias]))
                fresh[cell] = _merge_fresh(fresh.get(cell), d)
        rows = _emit(
            fresh, totals,
            lambda cell, prev, d: (*emit_key_values(cell[0]), cell[1], prev, d),
            sort_key=lambda c: (repr(c[0]), c[1]),
        )
        if evict_before_batch is not None:
            totals = {c: v for c, v in totals.items() if c[1] >= evict_before_batch}
        state.update((pickle.dumps(totals),))
        yield pd.DataFrame(rows, columns=out_cols)

    return bucketed.groupBy("__kb__").applyInPandasWithState(
        fn_bucketed, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
