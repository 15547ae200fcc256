"""Serving-side store wrappers — the summingbird-client store zoo.

Re-expressions of:

* ``ClientMergeable`` (summingbird-client/.../store/ClientMergeable.scala:36-120)
  — a ClientStore that can also WRITE: ``merge`` returns the pre-merge
  client total (offline snapshot ⊕ online batches visible before the
  delta) for every delta key, then persists the delta into the online
  store. Bulk (one DataFrame per call), never per-key IO.
* ``SideEffectStore`` (SideEffectStore.scala:29-44) — triggers a side
  effect with the touched keys after every merge.
* ``PresentingStore`` (PresentingStore.scala:35-46) — after every merge,
  snapshots the touched keys' combined offline⊕online value through a
  presenting Column function into a third store.

Spark-first: all reads are DataFrame views (filters push down to the
snapshot scans); writes are bulk version-dir swaps with the same atomic
``_SUCCESS`` protocol as the engine stores.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import semigroup as sg_mod
from .merge import client_view

_VER_DIR = re.compile(r"^v=(\d+)$")


class ClientMergeable:
    """Read-merged-write over (offline VersionedBatchStore, OnlineStore).

    ``readable()`` is the plain ClientStore view; ``merge(delta_df)``
    returns one row per delta (key, batch_id) with the PRE-merge combined
    total (NULL when the key was never seen — the reference's
    ``Future[Option[V]]``), then multi-merges the deltas into the online
    store (ClientMergeable.scala:76-82: existing through batch-1 ⊕ the
    online (k, batch) value before this delta).
    """

    def __init__(self, offline_store, online_store, key_cols: Sequence[str],
                 semigroup="sum"):
        self.offline = offline_store
        self.online = online_store
        self.key_cols = list(key_cols)
        self.semigroup = sg_mod.get(semigroup)

    def _offline_parts(self, spark) -> tuple[Optional[int], Optional[DataFrame]]:
        snap = self.offline.read_last(spark) if self.offline is not None else None
        return (None, None) if snap is None else snap

    def readable(self, spark: SparkSession,
                 through_batch: Optional[int] = None) -> DataFrame:
        """The ClientStore serving view (offline ⊕ online)."""
        off_b, off_df = self._offline_parts(spark)
        online = self.online.read(spark)
        if off_df is None and online is None:
            raise ValueError("ClientMergeable: both stores empty")
        if online is None:
            return off_df.select(*self.key_cols, "value")
        if off_df is None:
            off_df = online.select(*self.key_cols, "value").limit(0)
            off_b = None
        return client_view(
            off_df, online.select(*self.key_cols, "batch_id", "value"),
            self.key_cols, self.semigroup,
            offline_batch=off_b, through_batch=through_batch,
        )

    def merge(self, delta_df: DataFrame, value_col: str = "delta") -> DataFrame:
        """Bulk merge: returns (key_cols..., batch_id, value) pre-merge
        totals for exactly the delta rows, with the delta persisted after
        the pre-state is pinned."""
        spark = delta_df.sparkSession
        sg = self.semigroup
        off_b, off_df = self._offline_parts(spark)
        # pin the CURRENT online version before writing (multi_merge swaps
        # in a new version dir; this plan keeps reading the old one)
        online = self.online.read(spark)
        # carrier-typed NULLs for absent store sides: merge_null_safe's
        # otherwise-branch ANALYZES merge(a, b) even when a value is null,
        # and struct/array carriers (avg, moments, set, top-k) extract
        # fields — a bare VOID literal throws on the bootstrap path (fresh
        # online store / no offline store). The delta column carries the
        # same carrier type by the multi_merge contract.
        null_carrier = F.lit(None).cast(delta_df.schema[value_col].dataType)

        d = delta_df.select(*self.key_cols, "batch_id").distinct()
        if online is not None:
            o = online.select(*self.key_cols, F.col("batch_id").alias("__ob__"),
                              F.col("value").alias("__ov__"))
            if off_b is not None:
                o = o.where(F.col("__ob__") > off_b)
            # only online rows VISIBLE to each delta (batch ≤ the delta's);
            # aggregate, then left-join back so a delta with nothing
            # visible still yields a (NULL pre-state) row
            vis = d.join(o, self.key_cols, "inner").where(
                F.col("__ob__") <= F.col("batch_id")
            )
            # online rows hold CARRIER values — carrier fold, not the
            # raw-contract agg/agg_ordered
            if sg.commutative:
                agg = sg.agg_carrier(F.col("__ov__"))
            else:
                agg = sg.agg_carrier_ordered(F.col("__ob__"), F.col("__ov__"))
            on_tot = vis.groupBy(*self.key_cols, "batch_id").agg(agg.alias("__on__"))
            pre_on = d.join(on_tot, [*self.key_cols, "batch_id"], "left")
        else:
            pre_on = d.withColumn("__on__", null_carrier)

        if off_df is not None:
            pre = pre_on.join(
                off_df.select(*self.key_cols, F.col("value").alias("__off__")),
                self.key_cols, "left",
            )
        else:
            pre = pre_on.withColumn("__off__", null_carrier)
        out = pre.select(
            *self.key_cols, "batch_id",
            sg.merge_null_safe(F.col("__off__"), F.col("__on__")).alias("value"),
        )
        # materialize the pre-merge answer before the write mutates versions
        out_rows = out.cache()
        out_rows.count()
        self.online.multi_merge(delta_df, value_col=value_col)
        return out_rows


class SideEffectStore:
    """Wraps an OnlineStore; ``side_effect_fn(touched_keys_df)`` runs after
    every merge (SideEffectStore.scala:29-44 — there per key-future, here
    one bulk DataFrame per merge)."""

    def __init__(self, inner, side_effect_fn: Callable[[DataFrame], None]):
        self.inner = inner
        self.side_effect_fn = side_effect_fn

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def multi_merge(self, delta_df: DataFrame, value_col: str = "delta") -> None:
        self.inner.multi_merge(delta_df, value_col=value_col)
        self.side_effect_fn(delta_df.select(*self.inner.key_cols).distinct())


class KVParquetStore:
    """A tiny versioned (key → presented-value) parquet KV table — the
    presenting target (storehaus Store analog). put_all upserts."""

    def __init__(self, path: str, key_cols: Sequence[str]):
        self.path = path
        self.key_cols = list(key_cols)

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(m.group(1))
            for d in os.listdir(self.path)
            if (m := _VER_DIR.match(d))
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        )

    def read(self, spark: SparkSession) -> Optional[DataFrame]:
        vs = self._versions()
        if not vs:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v={vs[-1]}"))

    def put_all(self, rows: DataFrame) -> None:
        cur = self.read(rows.sparkSession)
        if cur is not None:
            rows = cur.join(
                rows.select(self.key_cols), self.key_cols, "left_anti"
            ).unionByName(rows)
        nxt = (self._versions()[-1] + 1) if self._versions() else 0
        rows.write.mode("overwrite").parquet(os.path.join(self.path, f"v={nxt}"))
        for v in self._versions()[:-2]:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)


def presenting_store(
    online_store,
    client: ClientMergeable,
    target: KVParquetStore,
    present: Callable[[Column], Column],
    presented_col: str = "presented",
    every_n_merges: int = 1,
    min_interval_seconds: float = 0.0,
) -> SideEffectStore:
    """PresentingStore.scala:35-46: after a merge, snapshot the touched
    keys' combined client value through ``present`` into ``target``.

    DEBOUNCE (write-amplification control): with the defaults every merge
    presents, like the reference. Raising ``every_n_merges`` /
    ``min_interval_seconds`` batches presents: between fires the touched
    keys APPEND to a tiny parquet pending log (no driver-side state — a
    streaming batch frame must not be held across triggers, and key sets
    can be large), and a fire presents the DISTINCT union of everything
    pending, so skipped merges lose no keys and each key presents its
    latest combined value. ``put_all`` rewrites the whole target per
    call, so fires are the expensive unit — at one fire per N merges the
    target write cost drops N-fold. Crash between ``put_all`` and the
    pending-log clear re-presents those keys next fire — presents are
    recomputed from the client view, so at-least-once is idempotent.
    The returned store exposes ``flush()`` to force a final fire
    (e.g. before decommission)."""
    import time

    pending_path = os.path.join(target.path, "_pending_keys")
    state = {"merges": 0, "last_fire": float("-inf")}

    def _fire(spark: SparkSession) -> None:
        if not os.path.isdir(pending_path):
            return
        touched = spark.read.parquet(pending_path).distinct()
        view = client.readable(spark).join(
            F.broadcast(touched), client.key_cols, "left_semi"
        )
        target.put_all(
            view.select(
                *client.key_cols, present(F.col("value")).alias(presented_col)
            )
        )
        shutil.rmtree(pending_path, ignore_errors=True)
        state["last_fire"] = time.monotonic()

    def effect(touched: DataFrame) -> None:
        spark = touched.sparkSession
        touched.write.mode("append").parquet(pending_path)
        state["merges"] += 1
        due = (
            state["merges"] >= every_n_merges
            and time.monotonic() - state["last_fire"] >= min_interval_seconds
        )
        if due:
            state["merges"] = 0
            _fire(spark)

    store = SideEffectStore(online_store, effect)
    store.flush = lambda spark: _fire(spark)
    return store
