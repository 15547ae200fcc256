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

``semantic_dedup_stream`` is the SEMANTIC member of the family — online
SemDeDup (Abbas et al. 2023, arXiv:2303.09540) with per-centroid
resident state: each arriving embedding is scored against every
already-seen same-cluster embedding and dropped when one with a SMALLER
id reaches the cosine threshold, exactly the cross-batch contract of
``functions.dedup.semantic_dedup_increment`` lifted onto
``applyInPandasWithState``.
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


def export_semantic_residents(
    residents: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    time_col: Optional[str] = None,
) -> int:
    """Write a RESIDENTS export ``semantic_dedup_stream(bootstrap_dir=)``
    can carry in — the batch→stream handoff of the semantic family (the
    same replay-free generation change ``export_summer_bootstrap`` gives
    the summer kernels): run the corpus history through batch
    ``semantic_dedup`` / ``semantic_dedup_increment``, export the seen
    rows here, and the online kernel continues WITHOUT replaying the
    history through the stream.

    ``residents`` must carry (id, vector, centroid_id) — e.g. the
    increment residents table ``spark.read.parquet(residents_dir)``, or
    ``semantic_dedup``'s decision table joined back to its vectors
    (dropped rows included: the witness contract needs every seen row).
    A NULL ``centroid_id`` or vector REFUSES in-plan with the row id —
    a resident outside any cluster can never be scanned.

    Layout: one partition dir per centroid
    (``<out_dir>/centroid_id=<cid>/``, columns ``id``/``vec``/``ts_ms``)
    so each state group's first touch reads ONLY its own cluster, plus
    a ``_manifest.json`` pinning kind and id type — the kernels refuse
    a mismatched export instead of mis-seeding (the summer bootstrap's
    r15 discipline). ``ts_ms`` comes from ``time_col`` when given, else
    NULL; the kernel seeds NULL as epoch-0, i.e. "historically old" —
    under a watermark policy carried-in residents evict as soon as the
    horizon first advances past the epoch, and with no watermark they
    persist. Returns the exported row count."""
    import json

    from .planner import _checkpoint_fs, _fs_write_text

    spark = residents.sparkSession
    id_ddl = residents.schema[id_col].dataType.simpleString()
    guarded = F.when(
        F.col("centroid_id").isNotNull() & F.col(vec_col).isNotNull(),
        F.col("centroid_id"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("export_semantic_residents: row "),
                F.col(id_col).cast("string"),
                F.lit(
                    f" has a NULL centroid_id or {vec_col}; residents "
                    "must be assigned, non-NULL vectors (NULL-vector "
                    "rows never become residents — filter them)."
                ),
            )
        ).cast("int")
    )
    ts = (
        F.unix_millis(F.col(time_col)) if time_col is not None
        else F.lit(None).cast("long")
    )
    (
        residents.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
            ts.alias("ts_ms"),
            guarded.cast("int").alias("centroid_id"),
        )
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(out_dir)
    )
    n = spark.read.parquet(out_dir).count()
    manifest = {
        "format": "summingbird-spark-bootstrap/1",
        "kind": "semantic_residents",
        "id_type": id_ddl,
        "has_ts": time_col is not None,
        "rows": int(n),
    }
    fs, root, jvm = _checkpoint_fs(spark, str(out_dir))
    side = jvm.org.apache.hadoop.fs.Path(root, "_manifest.json")
    _fs_write_text(fs, side, json.dumps(manifest, indent=1), jvm=jvm)
    return n


def _load_semantic_residents(bootstrap_dir: str, cid: int):
    """Worker-side load of ONE centroid's carried-in residents from an
    ``export_semantic_residents`` layout. A missing partition dir = no
    residents for this cluster (normal); any OTHER read error propagates
    — silently seeding empty would un-dedup the whole cluster."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    part = os.path.join(str(bootstrap_dir), f"centroid_id={int(cid)}")
    try:
        t = pq.read_table(part, columns=["id", "vec", "ts_ms"])
    except FileNotFoundError:
        return None
    if t.num_rows == 0:
        return None
    ids = np.asarray(t.column("id").to_pylist())
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("vec").to_pylist()]
    )
    # normalize HERE: state-resident vectors are stored normalized, and
    # a seeded resident must score identically to one that arrived via
    # the stream. ts NULL = epoch-0 ("historically old": first watermark
    # advance evicts)
    ts = np.asarray(
        [v if v is not None else 0 for v in t.column("ts_ms").to_pylist()],
        dtype=np.int64,
    )
    vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    return {"ids": ids, "vecs": vecs, "ts": ts}


def semantic_dedup_stream(
    stream: DataFrame,
    threshold: float,
    centroids: Optional[DataFrame] = None,
    assigned: Optional[DataFrame] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    time_col: Optional[str] = None,
    watermark: Optional[str] = None,
    on_unassigned: str = "error",
    max_residents: Optional[int] = None,
    block_rows: int = 1024,
    bootstrap_dir: Optional[str] = None,
) -> DataFrame:
    """Online SemDeDup — streaming cluster-scoped embedding dedup with
    per-centroid RESIDENT state (the streaming twin of
    ``functions.dedup.semantic_dedup_increment``, the way
    ``dedup_stream`` is the streaming twin of ``exact_dedup``).

    Each micro-batch row is quantized to its nearest centroid, then
    scored against every already-seen same-cluster row: it is dropped
    iff some SEEN row with a SMALLER id reaches ``threshold`` cosine
    (min-id keep policy, the family convention). Dropped rows still
    become residents — SemDeDup's witness is the nearest EARLIER row
    regardless of its own survival — so with ids nondecreasing across
    micro-batches the emitted decisions EQUAL the one-shot
    ``semantic_dedup`` over the whole stream, witnesses included (the
    same monotone-id equivalence ``semantic_dedup_increment`` is graded
    by; out-of-order arrivals are never retroactively revised). The
    scoring kernel is byte-identical math to the increment's
    (id-sorted prefix, blocked masked matmul, first-max argmax).

    Cluster assignment, one of:

    * ``assigned=`` — a STATIC (id, centroid_id) table (the persisted
      IVF artifact): a stream-static equi-join (auto-broadcast when the
      artifact is small; shuffled per micro-batch when it is
      corpus-sized — it is one row per corpus row, so no forced hint),
      zero Python in the assignment path and exactness by construction.
      ``on_unassigned`` matches the batch contract: ``'error'`` refuses
      IN-PLAN on the first row the artifact predates (lazy codegen'd
      ``raise_error``); ``'keep'`` routes such rows through as
      survivors with a NULL centroid, like NULL vectors.
    * ``centroids=`` — a (centroid_id, vector) table, collected ONCE at
      plan time (k x dim doubles on the driver — the same bounded
      posture as ``ivf_assign_hierarchical``'s broadcast; streaming k
      is index-build-sized, tens to thousands) and applied per batch as
      one Arrow-vectorized ``mapInPandas`` matmul-argmax with the flat
      assigner's tie-break (first max = smallest centroid_id).

    STATE is one resident set per centroid: ids + float64 vectors
    (+ event-time ms when ``time_col`` is given), ~(8 + 8*dim) bytes per
    seen row, sharded across executors by centroid. Two bounds:

    * ``watermark`` (needs ``time_col``): residents whose event time
      falls behind the query watermark are EVICTED at the start of each
      batch — state is bounded by the horizon and a duplicate arriving
      beyond it re-emits as a survivor (at-least-once dedup; the batch
      layer's ``semantic_dedup`` reconciles, the reference's lambda
      split). Mirrors ``dedup_stream``'s posture.
    * ``max_residents`` — a per-cluster cap (the streaming analog of
      ``semantic_dedup``'s ``max_cluster_size`` pathological-cluster
      guard): when a cluster's residents exceed it, only the NEWEST
      ``max_residents`` (by event time, then id) are kept, so a
      boilerplate sink cannot grow one task's state without bound.
      Duplicates of evicted residents go undetected — the standard
      production trade.

    ``bootstrap_dir`` seeds a FRESH checkpoint's state from a batch
    ``export_semantic_residents`` layout — the lambda handoff: dedup the
    corpus history offline (``semantic_dedup`` / ``_increment``), export
    the seen rows, and the stream continues against them with ZERO
    replay (the semantic twin of ``stateful_summer(bootstrap_dir=)``).
    Each cluster loads only its own partition dir, on its first touch,
    worker-side; the export's manifest is verified at plan time (kind +
    id type) and a resumed checkpoint never re-seeds. Carried-in
    residents without timestamps count as epoch-old: a watermark policy
    evicts them the first time the horizon advances.

    NULL vectors pass through as survivors with a NULL centroid and
    never enter state. Returns, in ``update`` output mode, one decision
    row per input row::

        (<id_col>, centroid_id, is_survivor,
         nearest_prior_id, nearest_prior_sim[, <time_col>])

    Scale shape: one stream-static broadcast join (or one shuffle-free
    mapInPandas), ONE shuffle on centroid_id into the stateful scan,
    Θ(N·(R+N)/k) flops per batch (N new rows, R residents) — never the
    residents' own pairs again. Reference anchor: the reference's
    online store multiMerge keyed by (K, BatchID)
    (summingbird-storm/src/main/scala/com/twitter/summingbird/storm/
    StormPlatform.scala) — here K = centroid, the merge = the resident
    scan.
    """
    import pickle

    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]; got {threshold!r}")
    if (centroids is None) == (assigned is None):
        raise ValueError("exactly one of centroids= / assigned=")
    if on_unassigned not in ("error", "keep"):
        raise ValueError(
            f"on_unassigned must be 'error' or 'keep'; got {on_unassigned!r}"
        )
    if (watermark is not None) and time_col is None:
        raise ValueError("watermark eviction needs time_col")
    if max_residents is not None and max_residents < 1:
        raise ValueError(f"max_residents must be >= 1; got {max_residents!r}")

    id_ddl = stream.schema[id_col].dataType.simpleString()
    if bootstrap_dir is not None:
        # plan-time layout pin (the summer bootstrap's r15 discipline):
        # verify the export exists, is a semantic-residents export, and
        # routes the same id type — refuse rather than mis-seed
        from .state_tools import read_bootstrap_manifest

        manifest = read_bootstrap_manifest(stream.sparkSession, bootstrap_dir)
        if manifest is None:
            raise ValueError(
                f"bootstrap_dir {bootstrap_dir!r} has no _manifest.json — "
                "not an export_semantic_residents layout (or a partial "
                "write); re-run the export"
            )
        if manifest.get("kind") != "semantic_residents":
            raise ValueError(
                f"bootstrap_dir {bootstrap_dir!r} holds a "
                f"{manifest.get('kind')!r} export, not semantic_residents "
                "— the carried blobs would seed the wrong state shape"
            )
        if manifest.get("id_type") != id_ddl:
            raise ValueError(
                f"bootstrap_dir {bootstrap_dir!r} was exported with id "
                f"type {manifest.get('id_type')!r} but the stream's "
                f"{id_col!r} is {id_ddl!r} — min-id ordering is "
                "type-sensitive; re-run the export with matching ids"
            )
    id_is_int = id_ddl in ("tinyint", "smallint", "int", "bigint", "long")
    tcols = [time_col] if time_col is not None else []

    # ---- assignment: centroid_id onto every row (sentinel -1 = "no
    # cluster": NULL vectors, and unassigned rows under 'keep')
    if assigned is not None:
        a = assigned.select(
            F.col(id_col), F.col("centroid_id").alias("__cid__")
        )
        # NO broadcast hint: the artifact is one row per CORPUS row — at
        # index scale that side is un-broadcastable (a forced hint would
        # OOM every executor at 10^9 ids). Catalyst still auto-broadcasts
        # a small artifact (autoBroadcastJoinThreshold works from static
        # size estimates even with AQE off in stateful streams); a big
        # one gets a per-micro-batch shuffled equi-join, which is the
        # right plan — the stream side is the small one each trigger.
        j = stream.join(a, id_col, "left")
        if on_unassigned == "error":
            cid = F.when(
                F.col(vec_col).isNull(), F.lit(-1)
            ).when(
                F.col("__cid__").isNotNull(), F.col("__cid__")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("semantic_dedup_stream: row "),
                        F.col(id_col).cast("string"),
                        F.lit(
                            " is absent from the supplied `assigned` table"
                            " (the artifact predates it). Rebuild the"
                            " index, pass centroids= to assign in-stream,"
                            " or on_unassigned='keep'."
                        ),
                    )
                ).cast("int")
            )
        else:
            cid = F.when(
                F.col(vec_col).isNull() | F.col("__cid__").isNull(), F.lit(-1)
            ).otherwise(F.col("__cid__"))
        work = j.select(
            id_col, vec_col, *tcols, cid.cast("int").alias("centroid_id")
        )
    else:
        crows = sorted(
            centroids.select("centroid_id", vec_col).collect(),
            key=lambda r: r["centroid_id"],
        )
        if not crows:
            raise ValueError("centroids= is empty")
        c_ids = np.asarray([r["centroid_id"] for r in crows], dtype=np.int32)
        C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in crows])
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

        assign_schema = ", ".join(
            [f"{id_col} {id_ddl}", f"{vec_col} array<double>"]
            + [f"{c} timestamp" for c in tcols]
            + ["centroid_id int"]
        )

        def assign(pdfs):
            for pdf in pdfs:
                out = pdf[[id_col, vec_col, *tcols]].copy()
                vecs = pdf[vec_col]
                ok = vecs.notna().to_numpy()
                cidv = np.full(len(pdf), -1, dtype=np.int32)
                if ok.any():
                    X = np.stack(vecs[ok].to_numpy()).astype(np.float64)
                    X /= np.maximum(
                        np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                    )
                    # first-max argmax over centroid-id-ascending rows ==
                    # ivf_assign's (sim DESC, centroid_id ASC) tie-break
                    cidv[ok] = c_ids[np.argmax(X @ C.T, axis=1)]
                out["centroid_id"] = cidv
                yield out

        work = stream.mapInPandas(assign, assign_schema)

    if watermark is not None:
        # a NULL event time has no place on a horizon: it cannot be
        # compared to the watermark (NaT would decode as int64-min — an
        # instantly-evicted resident, silent under-dedup). Refuse
        # in-plan with the row id (lazy codegen'd check, no extra job).
        work = work.withColumn(
            time_col,
            F.when(F.col(time_col).isNotNull(), F.col(time_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("semantic_dedup_stream: row "),
                        F.col(id_col).cast("string"),
                        F.lit(
                            f" has a NULL {time_col}; watermark eviction"
                            " needs an event time on every row — filter"
                            " or repair upstream, or run without a"
                            " watermark."
                        ),
                    )
                ).cast("timestamp")
            ),
        )
        work = work.withWatermark(time_col, watermark)

    out_schema = ", ".join(
        [
            f"{id_col} {id_ddl}",
            "centroid_id int",
            "is_survivor boolean",
            f"nearest_prior_id {id_ddl}",
            "nearest_prior_sim double",
        ]
        + [f"{c} timestamp" for c in tcols]
    )
    out_cols = [
        id_col, "centroid_id", "is_survivor",
        "nearest_prior_id", "nearest_prior_sim", *tcols,
    ]
    state_schema = "blob binary"
    id_np = "Int64" if id_is_int else "object"

    def scan(key, pdfs, state: GroupState):
        cid = int(key[0])
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            # state-maintenance invocation (e.g. watermark-only batch):
            # nothing arrived, nothing to emit or evict eagerly
            return
        pdf = pd.concat(batches, ignore_index=True)
        if cid == -1:
            # no-cluster sentinel: NULL vectors / unassigned-kept rows
            # pass through as survivors, never touch state
            out = pd.DataFrame({
                id_col: pd.array(pdf[id_col], dtype=id_np),
                "centroid_id": pd.array([pd.NA] * len(pdf), dtype="Int32"),
                "is_survivor": pd.array([True] * len(pdf), dtype="boolean"),
                "nearest_prior_id": pd.array([pd.NA] * len(pdf), dtype=id_np),
                "nearest_prior_sim": pd.array(
                    [pd.NA] * len(pdf), dtype="Float64"),
                **{c: pdf[c].to_numpy() for c in tcols},
            })
            yield out[out_cols]
            return

        if state.exists:
            res = pickle.loads(bytes(state.get[0]))
        elif bootstrap_dir is not None:
            # first touch of this cluster in a fresh checkpoint: seed
            # from the batch export (replay-free handoff). Never
            # re-seeds: every scan ends in state.update, so state.exists
            # holds from the next micro-batch on — even after the
            # watermark evicts every carried-in resident.
            res = _load_semantic_residents(bootstrap_dir, cid)
        else:
            res = None
        r_ids = res["ids"] if res is not None else np.array([], dtype=object)
        r_vecs = (
            res["vecs"] if res is not None else np.zeros((0, 0), np.float64)
        )
        r_ts = res["ts"] if res is not None else np.array([], dtype=np.int64)

        # horizon eviction FIRST: a resident behind the watermark is
        # forgotten before scoring, so its late duplicates re-emit
        wm = state.getCurrentWatermarkMs() if watermark is not None else 0
        if wm > 0 and len(r_ids):
            keep = r_ts >= wm
            r_ids, r_ts = r_ids[keep], r_ts[keep]
            r_vecs = r_vecs[keep]

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n_ids = pdf[id_col].to_numpy()
        N = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        N /= np.maximum(np.linalg.norm(N, axis=1, keepdims=True), 1e-12)
        n_ts = (
            (pdf[time_col].to_numpy().astype("datetime64[ms]").astype(np.int64))
            if time_col is not None
            else np.zeros(len(pdf), dtype=np.int64)
        )

        # seen = residents + this batch, id-sorted — then score ONLY the
        # new positions against the strict-smaller-id prefix: identical
        # math to semantic_dedup_increment's scan_new
        R = len(r_ids)
        if R and r_vecs.shape[1] != N.shape[1]:
            raise ValueError(
                f"semantic_dedup_stream: embedding dim changed "
                f"{r_vecs.shape[1]} -> {N.shape[1]} for centroid {cid}"
            )
        all_ids = np.concatenate([r_ids, n_ids]) if R else n_ids
        X = np.concatenate([r_vecs, N]) if R else N
        all_ts = np.concatenate([r_ts, n_ts]) if R else n_ts
        order = np.argsort(all_ids, kind="mergesort")
        all_ids, X, all_ts = all_ids[order], X[order], all_ts[order]
        pos_new = np.nonzero(order >= R)[0]
        n_new = len(pos_new)

        best_sim = np.full(n_new, np.nan)
        best_j = np.zeros(n_new, dtype=np.int64)
        for b in range(0, n_new, block_rows):
            sel = pos_new[b:b + block_rows]
            e = int(sel.max()) + 1
            S = X[sel] @ X[:e].T
            col = np.arange(e)
            S[col[None, :] >= sel[:, None]] = -np.inf
            jj = np.argmax(S, axis=1)
            best_sim[b:b + len(sel)] = S[np.arange(len(sel)), jj]
            best_j[b:b + len(sel)] = jj
        first = ~np.isfinite(best_sim)
        prior_id = pd.array(all_ids[best_j], dtype=id_np)
        prior_sim = pd.array(best_sim, dtype="Float64")
        prior_id[first] = pd.NA
        prior_sim[first] = pd.NA

        # dropped rows stay residents (the witness contract); cap keeps
        # the NEWEST rows by (event time, id)
        if max_residents is not None and len(all_ids) > max_residents:
            cut = np.lexsort((all_ids, all_ts))[-max_residents:]
            cut.sort()
            all_ids, X, all_ts = all_ids[cut], X[cut], all_ts[cut]
        state.update((pickle.dumps(
            {"ids": all_ids, "vecs": X, "ts": all_ts}
        ),))

        out = pd.DataFrame({
            id_col: pd.array(n_ids, dtype=id_np),
            "centroid_id": pd.array([cid] * n_new, dtype="Int32"),
            "is_survivor": pd.array(
                first | (best_sim < threshold), dtype="boolean"),
            "nearest_prior_id": prior_id,
            "nearest_prior_sim": prior_sim,
            **{c: pdf[c].to_numpy() for c in tcols},
        })
        yield out[out_cols]

    return work.groupBy("centroid_id").applyInPandasWithState(
        scan, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
