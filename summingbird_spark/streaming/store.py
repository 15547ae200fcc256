"""Online mergeable store — the storehaus MergeableStore analog.

Reference: the Storm platform aggregates into an online KV store via
``MergeableStoreFactory[(K, BatchID), V]`` (StormPlatform.scala:108) with
batched ``multiMerge`` writes (online/executor/Summer.scala:101-108). Here
the online store is a versioned parquet KV table keyed by
(key..., batch_id); each micro-batch's deltas semigroup-merge in via
``foreachBatch`` (bulk, not per-key IO).

Local-fs versioning uses the same atomic-_SUCCESS protocol as the batch
VersionedBatchStore; on a real deployment this becomes a Delta/Iceberg
MERGE or an external KV bulk-write — the interface (multi_merge / read /
lookup) is the stable part.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import semigroup as sg_mod

_VER_DIR = re.compile(r"^v=(\d+)$")


class OnlineStore:
    """Versioned mergeable KV store: (key..., batch_id) → value."""

    def __init__(self, path: str, key_cols: Sequence[str], semigroup="sum", versions_to_keep: int = 2):
        self.path = path
        self.key_cols = [*key_cols, "batch_id"]
        self.semigroup = sg_mod.get(semigroup)
        self.versions_to_keep = versions_to_keep

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            m = _VER_DIR.match(d)
            if m and os.path.exists(os.path.join(self.path, d, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def read(self, spark: SparkSession) -> Optional[DataFrame]:
        vs = self._versions()
        if not vs:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v={vs[-1]}"))

    def last_epoch(self) -> int:
        """Newest streaming epoch id applied to this store (-1 if none).

        Epochs are monotone for a single writer, so the max over retained
        versions is the high-water mark even after old versions vacuum."""
        out = -1
        for v in self._versions():
            p = os.path.join(self.path, f"v={v}", "_epoch")
            if os.path.exists(p):
                with open(p) as f:
                    out = max(out, int(f.read().strip()))
        return out

    def multi_merge(
        self, delta_df: DataFrame, value_col: str = "delta",
        epoch_id: Optional[int] = None,
    ) -> None:
        """Bulk merge one micro-batch of per-(key, batch) deltas.

        ``epoch_id`` (the foreachBatch batch id) makes the merge
        IDEMPOTENT per micro-batch: foreachBatch is at-least-once — a
        crash after the store write but before the checkpoint commit
        replays the same epoch on restart, and a blind semigroup merge
        would double-count it. An epoch at or below the applied
        high-water mark is a no-op (single-writer assumption; on a real
        deployment this guard is the txn/MERGE condition of the target
        store)."""
        if epoch_id is not None and epoch_id <= self.last_epoch():
            # Replayed micro-batch after a crash-restart: already applied.
            # Still CONSUME every partition — Spark validates that
            # foreachBatch processed the whole stateful DataFrame (state-
            # store commits ride on partition consumption); a bare early
            # return fails STATE_STORE_COMMIT_VALIDATION_FAILED on replay.
            delta_df.count()
            return
        spark = delta_df.sparkSession
        sg = self.semigroup
        # deltas within one micro-batch frame are already per-(key, batch)
        # singletons from the stateful summer; fold defensively anyway.
        # CARRIER fold (agg_carrier), not agg: the summer emits lifted
        # values — agg over a count tally would re-count rows (delta 5 →
        # 1), over moments structs it would power-sum structs
        delta = delta_df.groupBy(*self.key_cols).agg(
            sg.agg_carrier(F.col(value_col)).alias("__d__")
        )
        cur = self.read(spark)
        if cur is None:
            merged = delta.select(*self.key_cols, F.col("__d__").alias("value"))
        else:
            merged = (
                cur.withColumnRenamed("value", "__a__")
                .join(delta, self.key_cols, "full")
                .select(
                    *self.key_cols,
                    sg.merge_null_safe(F.col("__a__"), F.col("__d__")).alias("value"),
                )
            )
        nxt = (self._versions()[-1] + 1) if self._versions() else 0
        vdir = os.path.join(self.path, f"v={nxt}")
        merged.write.mode("overwrite").parquet(vdir)
        if epoch_id is not None:
            with open(os.path.join(vdir, "_epoch"), "w") as f:
                f.write(str(epoch_id))
        for v in self._versions()[: -self.versions_to_keep]:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)

    def lookup(self, spark: SparkSession, key_filter=None) -> DataFrame:
        df = self.read(spark)
        if df is None:
            raise ValueError("empty online store")
        return df.where(key_filter) if key_filter is not None else df


def run_summer_to_store(
    stream_df: DataFrame,
    store: OnlineStore,
    checkpoint: str,
    trigger_available_now: bool = True,
    state_store_provider: Optional[str] = None,
):
    """writeStream.foreachBatch bulk-merging each trigger's (prev, delta)
    rows into the online store; returns the StreamingQuery.

    ``state_store_provider``: optional state-store provider class (e.g.
    ``streaming.planner.ROCKSDB_STATE_STORE`` — disk-backed state, the
    scale path when open (key, batch) cardinality outgrows executor
    heap). Scoped around the query start only; the provider pins to the
    checkpoint at creation."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Persist: the sink takes two actions on the micro-batch frame
        # (isEmpty probe, then the merge write), and foreachBatch frames
        # re-execute their whole plan — source scan + shuffle +
        # applyInPandasWithState — per action. Caching halves the
        # per-trigger cost (~2.5 s → ~1.5 s per trigger at sf0.1).
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            store.multi_merge(batch_df, epoch_id=batch_id)
        finally:
            batch_df.unpersist()

    from .planner import guard_state_checkpoint

    guard_state_checkpoint(stream_df, checkpoint)
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        q = q.trigger(availableNow=True)
    from .planner import state_store_provider as _scope

    with _scope(stream_df.sparkSession, state_store_provider):
        return q.start()
