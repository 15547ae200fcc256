"""Checkpoint state observability: decode a summer checkpoint's live
state into a queryable DataFrame, and audit bucket skew — without
stopping the job.

Spark 4's ``statestore`` data source reads any streaming checkpoint's
state store as (key, value, partition_id) rows through the public
reader API. Our stateful summer keeps its state as ONE binary cell per
physical group — per-key mode: group = the key columns, cell =
``{batch_id: running total}``; bucketed mode (the default layout):
group = ``__kb__ = xxhash64(keys) % buckets``, cell =
``{(key_tuple, batch_id): running total}`` with ``NAN_KEY`` sentinels
for float-NaN key values (streaming/stateful.py:461,504). The helpers
here explode those cells back into logical rows, distributively
(``mapInPandas`` over the state partitions — no driver collect, so a
billion-entry state decodes at scan parallelism).

Why it matters at 100 TB:

* **Audit / reconcile**: the decoded totals are exactly the running
  (key, batch) aggregates the summer would use as ``prev`` for the next
  trigger — comparable against the OnlineStore or a batch recompute
  without replaying the corpus.
* **Skew + sizing**: ``state_skew_report`` shows keys and bytes per
  bucket straight from the checkpoint, the ground truth the
  ``summer_key_buckets`` sizing heuristic estimates at plan time
  (hash imbalance or a carrier blow-up shows up HERE first).
* **Migration escrow**: before re-bucketing at a new ``key_buckets``
  (guarded by ``guard_state_checkpoint``), the export preserves the old
  checkpoint's exact in-flight totals for verification of the replayed
  generation — the round-14 migration test's "merged totals equal a
  one-shot run" check, runnable against production checkpoints.

The reference exposed its online state only through the store's public
read path (summingbird-online MergeableStore); Spark's checkpoint
reader lets us do better — state introspection is a first-class query.
"""

from __future__ import annotations

import pickle
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stateful import NAN_KEY

#: state-source column carrying our pickled cell (applyInPandasWithState
#: wraps the user state tuple in a groupState struct; our state schema is
#: the 1-tuple ("state binary"))
_STATE_COL = "value.groupState.state"


def _int_key_fields(src: DataFrame, key_fields: list) -> list:
    """Key columns whose Spark type is integral — the ones pandas decodes
    as float64 whenever any resident key value is NULL."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return [
        n for n in key_fields
        if isinstance(src.schema[n].dataType,
                      (ByteType, ShortType, IntegerType, LongType))
    ]


def _guard_export_int_keys(pdf, int_keys: list) -> None:
    """Fail loudly where a per-key export would write poison: a
    checkpoint whose integral key column holds any NULL resident decodes
    through Arrow→pandas as float64, and key values at/beyond 2^53 are
    already rounded by that conversion — corrupting cell identity AND
    bucket routing in the bootstrap (ADVICE r14). Per-key mode is the
    documented escape hatch for exactly such keys
    (stateful.guard_int_keys), so the guard must live here too."""
    import numpy as np

    from .stateful import _F64_EXACT_INT

    for k in int_keys:
        col = pdf[k]
        if col.dtype.kind != "f":
            continue
        vals = col.to_numpy()
        finite = np.isfinite(vals)
        if finite.any() and float(np.abs(vals[finite]).max()) >= _F64_EXACT_INT:
            raise ValueError(
                f"per-key state export: integral key column {k!r} holds "
                "values at or beyond 2^53 in a checkpoint that also has "
                "NULL residents for it — the Arrow→pandas float64 decode "
                "corrupts such keys silently, so the export would seed "
                "wrong cell identities. This checkpoint cannot migrate "
                "through the pandas decode path; keep it on per-key "
                "state (key_buckets=None) instead."
            )


def _key_fields(key_schema: str) -> list:
    """Field names from a key-column DDL string, parsed by Spark's own
    DDL parser — a naive comma split breaks on parameterized/nested
    types (``decimal(10,2)``, ``struct<...>``)."""
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(key_schema).fields]


def _load_statestore(
    spark: SparkSession,
    checkpoint: str,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> DataFrame:
    try:
        # the statestore source has executors resolve the session's
        # StateStoreCoordinator RPC endpoint, which Spark creates lazily
        # at the FIRST streaming query — force it into existence so a
        # fresh (read-only) session can decode a checkpoint without ever
        # having run a stream (otherwise: RpcEndpointNotFoundException
        # wrapped in CANNOT_LOAD_STATE_STORE)
        (
            spark._jsparkSession.sessionState()
            .streamingQueryManager()
            .stateStoreCoordinator()
        )
    except Exception:  # noqa: BLE001 — best-effort; reader may still work
        pass
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", int(batch_id))
    if operator_id:
        r = r.option("operatorId", int(operator_id))
    return r.load(checkpoint)


def read_summer_state(
    spark: SparkSession,
    checkpoint: str,
    key_schema: str,
    value_type: str = "double",
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> DataFrame:
    """Decode a stateful-summer checkpoint into logical state rows.

    Returns a DataFrame ``(<key cols...>, batch_id bigint, value
    <value_type>)`` — one row per in-flight (key, BatchID) running
    total. ``key_schema`` is the summer's key columns as DDL (e.g.
    ``"key string"`` or ``"user_id bigint, country string"``) in the
    same order the pipeline declared them; ``value_type`` is the
    carrier's SQL type (``"binary"`` keeps the pickled python carrier
    verbatim — the escape hatch for non-SQL carriers like sketch maps).

    Both physical layouts are handled transparently: the state key
    struct having a single ``__kb__`` field marks the bucketed layout
    (cells hold key tuples); anything else is per-key mode (the state
    key IS the logical key; cells hold ``{batch_id: total}``).
    ``NAN_KEY`` sentinels are restored to float NaN exactly as the
    summer's own emission path does. ``batch_id=None`` reads the latest
    committed state; pass an older committed batch for point-in-time
    reads (the state source's time travel).
    """
    import pandas as pd

    st = _load_statestore(spark, checkpoint, batch_id, operator_id)
    key_fields = _key_fields(key_schema)
    state_key_cols = st.schema["key"].dataType.fieldNames()
    bucketed = state_key_cols == ["__kb__"]
    out_schema = f"{key_schema}, batch_id bigint, value {value_type}"
    keep_pickled = value_type.strip().lower() == "binary"

    def _emit_value(v):
        return pickle.dumps(v) if keep_pickled else v

    if bucketed:
        src = st.select(F.col(_STATE_COL).alias("state"))

        def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                rows = []
                for blob in pdf["state"]:
                    if blob is None:
                        continue
                    for (kt, b), total in pickle.loads(bytes(blob)).items():
                        kv = tuple(
                            float("nan") if v is NAN_KEY else v for v in kt
                        )
                        rows.append((*kv, int(b), _emit_value(total)))
                yield pd.DataFrame(
                    rows, columns=[*key_fields, "batch_id", "value"]
                )

        return src.mapInPandas(decode, out_schema)

    # per-key layout: logical key lives in the state KEY struct
    src = st.select(
        *[F.col(f"key.{c}").alias(n) for c, n in zip(state_key_cols, key_fields)],
        F.col(_STATE_COL).alias("state"),
    )

    def decode_perkey(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for rec in pdf.itertuples(index=False):
                blob = rec[-1]
                if blob is None:
                    continue
                for b, total in pickle.loads(bytes(blob)).items():
                    rows.append((*rec[:-1], int(b), _emit_value(total)))
            yield pd.DataFrame(rows, columns=[*key_fields, "batch_id", "value"])

    return src.mapInPandas(decode_perkey, out_schema)


def export_summer_bootstrap(
    spark: SparkSession,
    checkpoint: str,
    out_path: str,
    key_schema: str,
    new_key_buckets: int,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> int:
    """Export a summer checkpoint's state as a REPLAY-FREE carry-in for
    a fresh checkpoint at a different bucket count — the migration path
    for an 'auto'-sized job whose corpus outgrew its pinned layout
    without re-reading 100 TB of history.

    Decodes every in-flight (key, BatchID) running total from
    ``checkpoint`` (either physical layout), re-routes each cell to its
    bucket under ``new_key_buckets`` using the summer's own hash
    (``bucket_by_key_hash`` — bit-identical routing to what the new
    pipeline will compute at ingest), and writes one partition dir per
    new bucket (``<out_path>/__kb__=<i>/``) of verbatim pickled
    (cell key, total) pairs. Start the new generation with
    ``StreamPlanner(summer_key_buckets=<new_key_buckets>,
    summer_bootstrap_dir=<out_path>)`` pointed at the GO-FORWARD source
    (new files / new offsets — the old corpus is already folded into the
    export); each bucket's first trigger seeds its state from its
    partition and ``prev`` continues exactly where the old generation
    stopped.

    ``key_schema`` must repeat the pipeline's key columns with their
    EXACT Spark types (``xxhash64`` is type-sensitive: a bigint and an
    int of the same value route to different buckets). Returns the
    number of exported state cells; ``out_path`` is overwritten.

    Reference anchor: the streaming analog of InitialBatchedStore
    seeding a store's first batch with pre-computed data
    (summingbird-scalding/.../store/InitialBatchedStore.scala:1-40) —
    carried-in state instead of replayed history; the reference never
    re-sizes online shards at all (StormTopologyBuilder.scala:291-298),
    so this is a capability it lacks.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, FloatType

    from .stateful import sentinel_key_tuple

    if int(new_key_buckets) <= 0:
        raise ValueError(f"new_key_buckets must be positive; got {new_key_buckets!r}")
    st = _load_statestore(spark, checkpoint, batch_id, operator_id)
    key_fields = _key_fields(key_schema)
    state_key_cols = st.schema["key"].dataType.fieldNames()
    bucketed = state_key_cols == ["__kb__"]
    mid_schema = f"{key_schema}, cell binary, total binary"

    if bucketed:
        src = st.select(F.col(_STATE_COL).alias("state"))

        def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                rows = []
                for blob in pdf["state"]:
                    if blob is None:
                        continue
                    for cell, total in pickle.loads(bytes(blob)).items():
                        kt = cell[0]
                        kv = tuple(
                            float("nan") if v is NAN_KEY else v for v in kt
                        )
                        rows.append(
                            (*kv, pickle.dumps(cell), pickle.dumps(total))
                        )
                yield pd.DataFrame(
                    rows, columns=[*key_fields, "cell", "total"]
                )

        mid = src.mapInPandas(decode, mid_schema)
    else:
        # per-key layout: synthesize the bucketed cell keys the NEW
        # kernel will use. Float/double key columns need the NaN-vs-NULL
        # distinction carried OUT of the JVM (pandas conflates both), so
        # companion isnan flags ride along exactly as at ingest.
        src = st.select(
            *[
                F.col(f"key.{c}").alias(n)
                for c, n in zip(state_key_cols, key_fields)
            ],
            F.col(_STATE_COL).alias("state"),
        )
        flagged_pos = [
            i
            for i, n in enumerate(key_fields)
            if isinstance(src.schema[n].dataType, (DoubleType, FloatType))
        ]
        flag_cols = [f"__knan_{key_fields[p]}__" for p in flagged_pos]
        for p, fc in zip(flagged_pos, flag_cols):
            src = src.withColumn(fc, F.isnan(F.col(key_fields[p])))
        nk = len(key_fields)
        int_keys_pk = _int_key_fields(src, key_fields)

        def decode_pk(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                _guard_export_int_keys(pdf, int_keys_pk)
                rows = []
                for rec in pdf.itertuples(index=False):
                    kvals, blob = rec[:nk], rec[nk]
                    fvals = rec[nk + 1:]
                    if blob is None:
                        continue
                    kt = sentinel_key_tuple(kvals, fvals, flagged_pos)
                    kv = tuple(
                        float("nan") if v is NAN_KEY else v for v in kt
                    )
                    for b, total in pickle.loads(bytes(blob)).items():
                        rows.append(
                            (
                                *kv,
                                pickle.dumps((kt, int(b))),
                                pickle.dumps(total),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[*key_fields, "cell", "total"]
                )

        mid = src.mapInPandas(decode_pk, mid_schema)

    return _write_routed_bootstrap(spark, mid, key_fields,
                                   new_key_buckets, out_path,
                                   key_schema, checkpoint, "summer")


#: sidecar pinning an export's physical layout; name starts with ``_`` so
#: Spark's parquet reader ignores it inside the bootstrap dir
BOOTSTRAP_MANIFEST = "_manifest.json"


def _canonical_key_fields(key_schema: str) -> list:
    """(name, canonical type) pairs in DDL order — the order the export
    routes with, which the new pipeline's ``keys`` list must repeat."""
    from pyspark.sql.types import StructType

    return [
        [f.name, f.dataType.simpleString()]
        for f in StructType.fromDDL(key_schema).fields
    ]


def read_bootstrap_manifest(spark: SparkSession, bootstrap_dir: str):
    """Read a bootstrap export's ``_manifest.json`` through the Hadoop
    FileSystem API (bare paths, ``file://``, ``hdfs://``, ``s3a://``…).
    Returns the manifest dict, or ``None`` for a pre-manifest (r14)
    export; raises if ``bootstrap_dir`` itself does not exist — a
    mistyped remote path must not read as "empty state" (ADVICE r14)."""
    import json

    from .planner import _checkpoint_fs, _fs_read_text

    fs, root, jvm = _checkpoint_fs(spark, str(bootstrap_dir))
    if not fs.exists(root):
        raise ValueError(
            f"bootstrap_dir {bootstrap_dir!r} does not exist — a mistyped "
            "path would silently start from empty state"
        )
    side = jvm.org.apache.hadoop.fs.Path(root, BOOTSTRAP_MANIFEST)
    if not fs.exists(side):
        return None
    try:
        return json.loads(_fs_read_text(spark, fs, side))
    except ValueError as e:
        raise ValueError(
            f"bootstrap manifest {bootstrap_dir!r}/{BOOTSTRAP_MANIFEST} is "
            f"corrupt ({e}) — refusing to seed from an export whose layout "
            "cannot be verified; re-run the export"
        ) from e


def _write_routed_bootstrap(
    spark, mid: DataFrame, key_fields: list, new_key_buckets: int,
    out_path: str, key_schema: str, source_checkpoint: str, kind: str,
) -> int:
    """Shared bootstrap tail: route each (keys..., cell, total) row to
    its bucket under the NEW count with the kernels' own ingest hash,
    write one partition dir per bucket, then pin the layout in a
    ``_manifest.json`` sidecar the kernels verify at start — a bucket
    count or key-type drift between export and resume would otherwise
    mis-route hashes and seed PARTIAL state silently (the reference pins
    one shard layout per topology for the same reason,
    summingbird-storm/.../StormTopologyBuilder.scala:291-298)."""
    import json

    from .planner import _checkpoint_fs, _fs_write_text
    from .stateful import bucket_by_key_hash

    routed, _flags, _pos = bucket_by_key_hash(
        mid, key_fields, int(new_key_buckets)
    )
    (
        routed.select("__kb__", "cell", "total")
        .repartition("__kb__")
        .write.mode("overwrite")
        .partitionBy("__kb__")
        .parquet(out_path)
    )
    cells = spark.read.parquet(out_path).count()
    manifest = {
        "format": "summingbird-spark-bootstrap/1",
        "kind": kind,
        "new_key_buckets": int(new_key_buckets),
        "key_schema_fields": _canonical_key_fields(key_schema),
        "source_checkpoint": str(source_checkpoint),
        "cells": int(cells),
    }
    fs, root, jvm = _checkpoint_fs(spark, str(out_path))
    side = jvm.org.apache.hadoop.fs.Path(root, BOOTSTRAP_MANIFEST)
    _fs_write_text(fs, side, json.dumps(manifest, indent=1), jvm=jvm)
    return cells


def export_keyed_bootstrap(
    spark: SparkSession,
    checkpoint: str,
    out_path: str,
    key_schema: str,
    new_key_buckets: int,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> int:
    """``export_summer_bootstrap``'s twin for the TEMPORAL/LOOP-join
    kernels, whose state is ``{key_tuple: per-key kernel state}`` (latest
    pointer, running carrier, or windowed retraction buffer): export
    every resident key's kernel state re-routed under ``new_key_buckets``
    for a fresh checkpoint started with ``bootstrap_dir=`` on the service
    (``TemporalService`` / ``StoreService``). Kernel states carry
    VERBATIM — a migrated as-of lookup of a key with no new right events
    still sees the old generation's latest value; a migrated loop join's
    running fold continues from the old total. Same contracts as the
    summer export: exact key types in ``key_schema``, go-forward source
    only, ``out_path`` overwritten."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, FloatType

    from .stateful import sentinel_key_tuple

    if int(new_key_buckets) <= 0:
        raise ValueError(f"new_key_buckets must be positive; got {new_key_buckets!r}")
    st = _load_statestore(spark, checkpoint, batch_id, operator_id)
    key_fields = _key_fields(key_schema)
    state_key_cols = st.schema["key"].dataType.fieldNames()
    bucketed = state_key_cols == ["__kb__"]
    mid_schema = f"{key_schema}, cell binary, total binary"

    if bucketed:
        src = st.select(F.col(_STATE_COL).alias("state"))

        def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                rows = []
                for blob in pdf["state"]:
                    if blob is None:
                        continue
                    for kt, kstate in pickle.loads(bytes(blob)).items():
                        kv = tuple(
                            float("nan") if v is NAN_KEY else v for v in kt
                        )
                        rows.append(
                            (*kv, pickle.dumps(kt), pickle.dumps(kstate))
                        )
                yield pd.DataFrame(
                    rows, columns=[*key_fields, "cell", "total"]
                )

        mid = src.mapInPandas(decode, mid_schema)
    else:
        src = st.select(
            *[
                F.col(f"key.{c}").alias(n)
                for c, n in zip(state_key_cols, key_fields)
            ],
            F.col(_STATE_COL).alias("state"),
        )
        flagged_pos = [
            i
            for i, n in enumerate(key_fields)
            if isinstance(src.schema[n].dataType, (DoubleType, FloatType))
        ]
        flag_cols = [f"__knan_{key_fields[p]}__" for p in flagged_pos]
        for p, fc in zip(flagged_pos, flag_cols):
            src = src.withColumn(fc, F.isnan(F.col(key_fields[p])))
        nk = len(key_fields)
        int_keys_pk = _int_key_fields(src, key_fields)

        def decode_pk(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                _guard_export_int_keys(pdf, int_keys_pk)
                rows = []
                for rec in pdf.itertuples(index=False):
                    kvals, blob = rec[:nk], rec[nk]
                    fvals = rec[nk + 1:]
                    if blob is None:
                        continue
                    kt = sentinel_key_tuple(kvals, fvals, flagged_pos)
                    kv = tuple(
                        float("nan") if v is NAN_KEY else v for v in kt
                    )
                    # the per-key blob IS the pickled kernel state —
                    # carry it verbatim as the cell payload
                    rows.append((*kv, pickle.dumps(kt), bytes(blob)))
                yield pd.DataFrame(
                    rows, columns=[*key_fields, "cell", "total"]
                )

        mid = src.mapInPandas(decode_pk, mid_schema)

    return _write_routed_bootstrap(spark, mid, key_fields,
                                   new_key_buckets, out_path,
                                   key_schema, checkpoint, "keyed")


def read_keyed_state(
    spark: SparkSession,
    checkpoint: str,
    key_schema: str,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> DataFrame:
    """Decode a TEMPORAL/LOOP-join checkpoint into one row per logical
    join key: ``(<key cols...>, state binary)`` where ``state`` is the
    per-key kernel state pickled verbatim (mode-dependent: latest
    pointer, running carrier, or a windowed retraction buffer —
    streaming/temporal.py:155,689). Use this for audits that only need
    key residency / per-key state sizes, or unpickle the blob for the
    mode you know you ran. Layout detection mirrors
    ``read_summer_state``: a single ``__kb__`` state-key field means the
    bucketed ``{key_tuple: kernel state}`` layout; otherwise the state
    key IS the logical key and the cell is that key's kernel state."""
    import pandas as pd

    st = _load_statestore(spark, checkpoint, batch_id, operator_id)
    key_fields = _key_fields(key_schema)
    state_key_cols = st.schema["key"].dataType.fieldNames()
    bucketed = state_key_cols == ["__kb__"]
    out_schema = f"{key_schema}, state binary"

    if bucketed:
        src = st.select(F.col(_STATE_COL).alias("state"))

        def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                rows = []
                for blob in pdf["state"]:
                    if blob is None:
                        continue
                    for kt, kstate in pickle.loads(bytes(blob)).items():
                        kv = tuple(
                            float("nan") if v is NAN_KEY else v for v in kt
                        )
                        rows.append((*kv, pickle.dumps(kstate)))
                yield pd.DataFrame(rows, columns=[*key_fields, "state"])

        return src.mapInPandas(decode, out_schema)

    return st.select(
        *[
            F.col(f"key.{c}").alias(n)
            for c, n in zip(state_key_cols, key_fields)
        ],
        F.col(_STATE_COL).alias("state"),
    )


def state_skew_report(
    spark: SparkSession,
    checkpoint: str,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> DataFrame:
    """Per-physical-group state audit for ANY of the engine's Python
    stateful kernels (summer, temporal as-of, loop join): one row per
    state group (bucket or key) with ``state_bytes`` (serialized cell
    size), ``entries`` (in-flight cells — (key, batch) totals for the
    summer, resident keys for the temporal kernels), and
    ``logical_keys`` (distinct keys resident). ``bucket`` is the
    ``__kb__`` value in bucketed mode, NULL in per-key mode.

    This is the measured ground truth behind bucket sizing: hash
    imbalance shows as a heavy ``logical_keys`` tail, a carrier blow-up
    (e.g. an unbounded set semigroup) as ``state_bytes`` outliers with
    ordinary key counts — each actionable (re-bucket via the guarded
    migration path / cap the carrier) before it becomes an executor OOM.
    Pure scan + decode at state-partition parallelism.
    """
    import pandas as pd

    st = _load_statestore(spark, checkpoint, batch_id, operator_id)
    state_key_cols = st.schema["key"].dataType.fieldNames()
    bucketed = state_key_cols == ["__kb__"]
    src = st.select(
        (F.col("key.__kb__") if bucketed else F.lit(None).cast("bigint"))
        .alias("bucket"),
        F.col(_STATE_COL).alias("state"),
    )

    def audit(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for rec in pdf.itertuples(index=False):
                bucket, blob = rec.bucket, rec.state
                if blob is None:
                    continue
                cells = pickle.loads(bytes(blob))
                if isinstance(cells, dict):
                    # summer cell keys are ((key_tuple), batch_id);
                    # temporal/loop cell keys are the key tuple itself
                    keys = {
                        c[0]
                        if isinstance(c, tuple) and c
                        and isinstance(c[0], tuple)
                        else c
                        for c in cells
                    } if bucketed else {None}
                    n_entries = len(cells)
                else:
                    # per-key temporal layout: the whole cell is ONE
                    # key's kernel state
                    keys, n_entries = {None}, 1
                rows.append(
                    (
                        None if bucket is None or pd.isna(bucket)
                        else int(bucket),
                        len(bytes(blob)),
                        n_entries,
                        len(keys),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["bucket", "state_bytes", "entries", "logical_keys"],
            )

    return src.mapInPandas(
        audit,
        "bucket bigint, state_bytes bigint, entries bigint, "
        "logical_keys bigint",
    )


def suggest_key_buckets(
    spark: SparkSession,
    checkpoint: str,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> dict:
    """Close the sizing loop from MEASURED state to a recommended bucket
    count: where plan-time ``summer_key_buckets='auto'`` estimates key
    cardinality with one approx_count_distinct scan of the corpus, this
    reads the checkpoint's actual resident keys (``state_skew_report``)
    and applies the same clamp (``auto_key_buckets``'s
    keys/target → [floor, partitions × cap]). Returns::

        {"resident_keys": ..., "current_buckets": ...,  # None = per-key
         "suggested_buckets": ..., "max_bucket_keys": ...,
         "max_bucket_bytes": ...}

    Use it before ``export_summer_bootstrap`` to pick the new
    generation's count from ground truth rather than a fresh estimate —
    e.g. migrate when ``max_bucket_keys`` drifts far above the
    ``AUTO_KEYS_PER_BUCKET`` target (corpus growth under a pinned
    layout) or ``max_bucket_bytes`` nears the state-store comfort zone
    (carrier growth).

    ``current_buckets`` is the CONFIGURED layout read from the
    checkpoint's pin sidecar when readable (populated-group counts would
    under-report whenever a bucket is empty); None means per-key or no
    readable pin. The report itself reduces to five aggregates
    Spark-side — no per-group driver collect, so a per-key checkpoint
    with 10⁹ resident keys still answers at scan parallelism."""
    import json

    from .planner import (
        _SIDECAR_NAME,
        _checkpoint_fs,
        _fs_read_text,
    )
    from .stateful import (
        AUTO_GROUPS_PER_PARTITION_CAP,
        AUTO_KEYS_PER_BUCKET,
        AUTO_MIN_BUCKETS,
    )

    agg = (
        state_skew_report(
            spark, checkpoint, batch_id=batch_id, operator_id=operator_id
        )
        .agg(
            F.count(F.lit(1)).alias("groups"),
            F.count("bucket").alias("bucketed_groups"),
            F.sum("logical_keys").alias("keys_bucketed"),
            F.max("logical_keys").alias("max_keys"),
            F.max("state_bytes").alias("max_bytes"),
        )
        .first()
    )
    bucketed = (agg["bucketed_groups"] or 0) > 0
    resident = int(
        (agg["keys_bucketed"] or 0) if bucketed else (agg["groups"] or 0)
    )
    current = None
    try:
        fs, root, jvm = _checkpoint_fs(spark, checkpoint)
        side = jvm.org.apache.hadoop.fs.Path(root, _SIDECAR_NAME)
        if fs.exists(side):
            entries = json.loads(_fs_read_text(spark, fs, side)).get(
                "key_buckets", []
            )
            counts = {e.get("key_buckets") for e in entries} - {None}
            if len(counts) == 1:
                current = counts.pop()
    except Exception:  # noqa: BLE001 — advisory field; report None
        current = None
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    want = -(-resident // max(1, AUTO_KEYS_PER_BUCKET))  # ceil
    cap = max(AUTO_MIN_BUCKETS, parts * AUTO_GROUPS_PER_PARTITION_CAP)
    return {
        "resident_keys": resident,
        "current_buckets": current if bucketed else None,
        "suggested_buckets": max(AUTO_MIN_BUCKETS, min(want, cap)),
        "max_bucket_keys": int(agg["max_keys"] or 0),
        "max_bucket_bytes": int(agg["max_bytes"] or 0),
    }


def read_semantic_residents(
    spark: SparkSession,
    checkpoint: str,
    id_type: str = "bigint",
    include_vectors: bool = False,
    batch_id: Optional[int] = None,
    operator_id: int = 0,
) -> DataFrame:
    """Decode an ONLINE-SemDeDup checkpoint
    (``streaming.dedup.semantic_dedup_stream``) into one row per
    RESIDENT: ``(centroid_id int, <id> id_type, ts_ms bigint[, vec
    array<double>])`` — the live answer to "what has the online dedup
    seen, per cluster", read distributively off the state store like
    the summer decoders (no stream restart, ``batch_id`` time travel).

    Uses: per-cluster residency/skew audits (``groupBy(centroid_id)``
    on the result — the semantic analog of ``state_skew_report``),
    verifying an eviction policy actually bounded state, or exporting a
    live checkpoint's residents with ``export_semantic_residents`` to
    re-seed a new generation (pass ``include_vectors=True``, which
    carries the full float64 vectors — leave it off for audits; the id
    and timestamp rows are ~1/100th the bytes at dim 768).

    Vectors come back L2-NORMALIZED (exactly as the kernel stores and
    scores them), so a re-export scores identically. ``ts_ms`` is 0 for
    rows ingested without a ``time_col``."""
    import numpy as np
    import pandas as pd

    st = _load_statestore(spark, checkpoint, batch_id, operator_id)
    state_key_cols = st.schema["key"].dataType.fieldNames()
    if state_key_cols != ["centroid_id"]:
        raise ValueError(
            f"checkpoint {checkpoint!r} operator {operator_id} holds state "
            f"keyed by {state_key_cols} — not a semantic_dedup_stream "
            "kernel (its state key is ['centroid_id']). Pick the right "
            "operator_id, or use read_summer_state/read_keyed_state."
        )
    vcols = ", vec array<double>" if include_vectors else ""
    out_schema = f"centroid_id int, id {id_type}, ts_ms bigint{vcols}"
    cols = ["centroid_id", "id", "ts_ms"] + (["vec"] if include_vectors else [])
    src = st.select(
        F.col("key.centroid_id").alias("centroid_id"),
        # the kernel's state schema is "blob binary" (the summer kernels
        # name their single field "state" — hence not _STATE_COL)
        F.col("value.groupState.blob").alias("state"),
    )

    def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for cid, blob in zip(pdf["centroid_id"], pdf["state"]):
                if blob is None:
                    continue
                res = pickle.loads(bytes(blob))
                ids, ts = res["ids"], res["ts"]
                if include_vectors:
                    vecs = np.asarray(res["vecs"], dtype=np.float64)
                    rows.extend(
                        (int(cid), i, int(t), v.tolist())
                        for i, t, v in zip(ids, ts, vecs)
                    )
                else:
                    rows.extend(
                        (int(cid), i, int(t)) for i, t in zip(ids, ts)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(decode, out_schema)
