"""Streaming planner: the SAME Producer DAG → Structured Streaming.

The Spark analog of the reference's Storm platform (SURVEY §2.3, §3.3):
``Storm.plan`` packs the DAG into Spout/FlatMap/Summer physical nodes
(online/planner/OnlinePlan.scala:24-263) — here the packing, shuffle
placement, and map-side pre-aggregation are Catalyst/AQE's job; our code
supplies only what Structured Streaming lacks: the per-(key, batch)
summer with (Option[prev], delta) output (streaming.stateful) and the
online mergeable store sink (streaming.store).

Node coverage mirrors the batch planner (stateless ops are identical
Column programs); differences:

* Source must be a streaming DataFrame (``spark.readStream``); the
  ``stream_source`` helper wraps file sources with rate limiting
  (``maxFilesPerTrigger`` — the reference's backpressure knob analog,
  maxSpoutPending StormPlatform.scala:133).
* Summer compiles to a stateful per-(key, batch_id) aggregation in update
  mode: every online aggregate is per-(key, batch) — never across batches
  (StormTopologyBuilder.scala:41-67: online keys are (K, BatchID)).
* Written nodes become ``foreachBatch`` effects attached to the returned
  StreamPlan.
* Watermarks are opt-in (`with_watermark`): the reference's default policy
  is "late data simply sums into its event-time batch whenever it arrives"
  (SURVEY §2.5) — that is exactly update-mode with no watermark.
"""

from __future__ import annotations

import logging

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..batch import batcher as b_mod
from ..batch.planner import BatchPlanner
from ..core import graph as g
from ..core import semigroup as sg_mod
from ..core.graph import TIME_COL
from .stateful import stateful_summer


#: OSS Spark's disk-backed state store (spillable, changelog-checkpointed).
#: The default HDFSBackedStateStoreProvider keeps every state row in
#: executor HEAP — the real ceiling for 100 TB-scale stateful streaming
#: (a billion open (key, batch) entries do not fit). RocksDB keeps the
#: working set on executor local disk with a block cache, so state size is
#: bounded by disk, not heap. Same public conf any Spark job would set;
#: this constant + scope just make it a first-class planner option.
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

_logger = logging.getLogger(__name__)


class state_store_provider:
    """Context manager scoping ``spark.sql.streaming.stateStore
    .providerClass`` around a streaming-query START. The provider is read
    when the query first creates its checkpoint and is pinned there for
    the checkpoint's lifetime, so only the ``.start()`` call needs to sit
    inside the scope; the session conf is restored on exit either way.

    >>> with state_store_provider(spark, ROCKSDB_STATE_STORE):
    ...     q = run_summer_to_store(plan.dataframe, store, ckpt)
    """

    def __init__(self, spark: SparkSession, provider: Optional[str]):
        self.spark, self.provider, self._old = spark, provider, None

    def __enter__(self):
        if self.provider:
            self._old = self.spark.conf.get(_PROVIDER_CONF, None)
            self.spark.conf.set(_PROVIDER_CONF, self.provider)
        return self

    def __exit__(self, *exc):
        if self.provider:
            if self._old is None:
                self.spark.conf.unset(_PROVIDER_CONF)
            else:
                self.spark.conf.set(_PROVIDER_CONF, self._old)
        return False


def stream_source(
    path: str,
    schema,
    time_col: Optional[str] = None,
    fmt: str = "parquet",
    max_files_per_trigger: Optional[int] = None,
    name: str = "stream",
) -> g.Source:
    """A file-based streaming source node (new files = new events)."""

    def loader(spark: SparkSession) -> DataFrame:
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.format(fmt).load(path)

    src = g.Source(loader, time_col, name)
    # batch twin of the same files — lets the planner run plan-time
    # static probes (e.g. summer_key_buckets="auto" key-cardinality)
    src.probe_loader = lambda spark: (
        spark.read.schema(schema).format(fmt).load(path)
    )
    return src


_SIDECAR_NAME = "_sbspark_key_buckets.json"


def _layout(doc) -> list:
    """The layout-relevant projection of a state-meta / sidecar document:
    (keys, bucket count) per stateful op, in compile order. Provenance
    fields (``auto``) are ignored so sidecars written by older releases
    (which lacked them) still compare equal when the layout matches."""
    return [
        [list(e.get("keys", [])), e.get("key_buckets")]
        for e in (doc or {}).get("key_buckets", [])
    ]


def _all_pinned(meta) -> bool:
    """True iff every bucket count in ``meta`` came from an explicit int
    (or None = per-key state) — i.e. the layout is deterministic across
    restarts regardless of corpus size. Entries missing the provenance
    flag are treated as NOT pinned (conservative)."""
    return all(
        e.get("auto") is False for e in (meta or {}).get("key_buckets", [])
    )


def _checkpoint_fs(spark, checkpoint: str):
    """Resolve a checkpoint URI through the Hadoop FileSystem API — one
    code path for bare local paths, ``file://``, ``hdfs://``, ``s3a://``…
    (whatever connectors the cluster classpath provides)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(str(checkpoint))
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _fs_read_text(spark, fs, jpath) -> str:
    # NB: a py4j-allocated byte[] does NOT see Java-side mutation, so a
    # readFully-into-buffer idiom silently returns zeros — read through a
    # JVM-side reader instead (commons-io is on Spark's classpath; the
    # BufferedReader loop is the no-extra-deps fallback)
    jvm = spark._jvm
    stm = fs.open(jpath)
    try:
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(stm, "UTF-8")
        except Exception:  # noqa: BLE001 — commons-io missing/changed API
            rdr = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stm, "UTF-8")
            )
            lines = []
            while True:
                ln = rdr.readLine()
                if ln is None:
                    break
                lines.append(ln)
            return "\n".join(lines)
    finally:
        stm.close()


def _fs_write_text(fs, jpath, text: str, jvm=None) -> None:
    """Write via a temp file + rename so a crash mid-write cannot leave a
    half-written file at the final path (a truncated sidecar on a live
    checkpoint would read as corrupt and block resumes). The
    delete+rename pair is not one atomic op on every filesystem, but its
    failure modes are benign: either the old file or NO file remains —
    and a missing sidecar re-derives deterministically for pinned plans
    and refuses loudly for 'auto' ones."""
    if jvm is not None:
        tmp = jvm.org.apache.hadoop.fs.Path(str(jpath) + "._tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if fs.exists(jpath):
            fs.delete(jpath, False)
        if not fs.rename(tmp, jpath):
            raise IOError(f"rename {tmp} -> {jpath} failed")
        return
    out = fs.create(jpath, True)  # overwrite=True
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


#: resident keys/bucket may drift this many times outside the
#: AUTO_KEYS_PER_BUCKET band before a resume warns (VERDICT r14 item 5)
RESIZE_ADVISORY_DRIFT = 4
_RESIZE_ADVISORY_ENV = "SBSPARK_RESIZE_ADVISORY"


def _advise_bucket_drift(spark, checkpoint: str, meta: dict) -> None:
    """Close the sizing loop at resume time: when a pinned layout's
    MEASURED resident keys put keys-per-bucket ≥ RESIZE_ADVISORY_DRIFT×
    outside the ``AUTO_KEYS_PER_BUCKET`` band (corpus grew under the pin,
    or the pin wildly over-provisioned), warn out loud naming the
    measured suggestion and the replay-free migration path. Advisory
    only: it never blocks a start (layout changes mid-checkpoint are what
    ``guard_state_checkpoint`` REFUSES; acting on this warning means
    exporting a bootstrap and starting a new generation —
    ``examples/state_migration.py``). One statestore-source scan per
    bucketed op, cluster-parallel, no driver collect; set
    ``SBSPARK_RESIZE_ADVISORY=0`` to skip it on latency-critical starts."""
    import os
    import warnings

    if os.environ.get(_RESIZE_ADVISORY_ENV, "1") in ("0", "false", ""):
        return
    entries = (meta or {}).get("key_buckets", [])
    for op_id, entry in enumerate(entries):
        current = entry.get("key_buckets")
        if current is None:  # per-key state: no fixed layout to outgrow
            continue
        try:
            from .state_tools import suggest_key_buckets

            rec = suggest_key_buckets(spark, checkpoint, operator_id=op_id)
        except Exception:  # noqa: BLE001 — advisory must never fail a start
            continue
        suggested = rec.get("suggested_buckets")
        if not suggested or rec.get("resident_keys", 0) <= 0:
            continue
        if (
            suggested >= RESIZE_ADVISORY_DRIFT * current
            or current >= RESIZE_ADVISORY_DRIFT * suggested
        ):
            warnings.warn(
                f"checkpoint {checkpoint!r} op {op_id} "
                f"(keys={entry.get('keys')}): pinned key_buckets={current} "
                f"but {rec['resident_keys']} resident keys measure out to "
                f"suggested_buckets={suggested} "
                f"(≥{RESIZE_ADVISORY_DRIFT}x drift). The layout stays "
                "pinned for this checkpoint's lifetime; to re-size without "
                "replay, export a bootstrap at the new count and start a "
                "new generation (see "
                "summingbird_spark.streaming.state_tools."
                "export_summer_bootstrap and examples/state_migration.py).",
                RuntimeWarning,
            )


def guard_state_checkpoint(
    df: Optional[DataFrame],
    checkpoint: Optional[str],
    meta: Optional[dict] = None,
    spark: Optional[SparkSession] = None,
) -> None:
    """Refuse to start a bucketed-state query against a checkpoint that was
    created under a DIFFERENT physical key-bucket layout.

    State rows are keyed by ``hash(key) % key_buckets``; Spark's state
    schema is identical for every bucket count, so resuming a checkpoint
    with a different count does not error — rows silently land in the
    wrong buckets and merge with the wrong keys' state. That hazard is
    mostly theoretical under a pinned int, but ``summer_key_buckets=
    "auto"`` (the default since r13) re-measures key cardinality at every
    plan, so a restart after the corpus grew would legitimately choose a
    different count. This guard makes that loud: the planner records each
    stateful op's resolved bucket count on the plan, the start helpers
    write them to ``<checkpoint>/_sbspark_key_buckets.json`` on first
    start, and any later start against the same checkpoint must match or
    raises with the pinned value to pass explicitly.

    Every checkpoint URI the cluster's Hadoop classpath can reach is
    guarded — the sidecar is read/written through the Hadoop FileSystem
    API, so ``hdfs://`` / ``s3a://`` checkpoints get the same pin bare
    local paths do (the reference never re-sizes shards under a live
    topology either: shard count is fixed per topology,
    summingbird-storm/.../StormTopologyBuilder.scala:291-298). Rules:

    * sidecar present, layout matches → resume.
    * sidecar present, layout differs, checkpoint has committed batches
      (an ``offsets/`` / ``state/`` / ``commits/`` dir exists) → raise.
    * sidecar present, layout differs, checkpoint EMPTY → the sidecar
      came from a start that failed before any batch committed; it pins
      nothing — replace it.
    * no sidecar, checkpoint has committed batches → the checkpoint
      predates the guard (or was written by the pre-r14 guard that
      skipped scheme'd paths) and its layout is unknown. If every bucket
      count in the current plan is explicitly pinned, the layout is
      deterministic — adopt and pin it. If ANY came from ``"auto"``,
      refuse: adopting would be exactly the silent wrong-bucket merge
      this guard exists to prevent (pre-r13 checkpoints were created
      under the old static default — pass ``summer_key_buckets=64``).
    * no sidecar, empty checkpoint → first start; write the sidecar.
    * the FileSystem for the scheme is unreachable → raise if any count
      is auto-resolved (an unpinnable checkpoint must not depend on a
      re-measured layout); warn and proceed when everything is pinned.

    ``meta`` defaults to ``df._sbspark_state_meta`` (attached by
    ``StreamPlanner.plan``); plans with no bucketed state are no-ops."""
    if meta is None and df is not None:
        meta = getattr(df, "_sbspark_state_meta", None)
    if not meta or not checkpoint:
        return
    import json
    import warnings

    spark = spark or (df.sparkSession if df is not None else None)
    if spark is None:
        raise ValueError("guard_state_checkpoint needs a df or a spark")
    try:
        fs, root, jvm = _checkpoint_fs(spark, checkpoint)
        Path = jvm.org.apache.hadoop.fs.Path
        sidecar = Path(root, _SIDECAR_NAME)
        has_sidecar = fs.exists(sidecar)
        # Spark writes offsets/<n> at the start of the FIRST micro-batch;
        # any of these dirs means the checkpoint has run under SOME layout
        has_state = any(
            fs.exists(Path(root, d)) for d in ("offsets", "state", "commits")
        )
    except Exception as e:  # noqa: BLE001 — unreachable scheme/filesystem
        if not _all_pinned(meta):
            raise ValueError(
                f"cannot pin state layout on checkpoint {checkpoint!r} "
                f"({type(e).__name__}: {e}) and the plan resolved at least "
                "one key-bucket count via 'auto' — a restart after corpus "
                "growth would silently re-size buckets and merge rows into "
                "the wrong keys' state. Pin explicit ints "
                "(StreamPlanner(summer_key_buckets=<int>) / "
                "key_buckets=<int> on the service) or use a reachable "
                "checkpoint URI."
            ) from e
        warnings.warn(
            f"state-layout sidecar unreachable on {checkpoint!r} "
            f"({type(e).__name__}); proceeding because every bucket count "
            "is explicitly pinned (deterministic layout)",
            RuntimeWarning,
        )
        return

    if has_sidecar:
        # a sidecar EXISTS: a read/parse failure here is corruption of
        # the pin itself, NOT an unreachable filesystem (we just listed
        # it) — lumping it into the fallback above would let an
        # all-pinned plan resume a live checkpoint with NO layout check,
        # the exact silent wrong-bucket merge this guard prevents.
        try:
            pinned = json.loads(_fs_read_text(spark, fs, sidecar))
        except Exception as e:  # noqa: BLE001 — corrupt/truncated sidecar
            if has_state:
                raise ValueError(
                    f"checkpoint {checkpoint!r} has committed state but "
                    f"its state-layout sidecar is unreadable "
                    f"({type(e).__name__}: {e}) — cannot verify the "
                    "bucket layout it was created under. Restore the "
                    "sidecar (_sbspark_key_buckets.json), or delete it "
                    "and re-start with the explicitly pinned counts the "
                    "checkpoint ran with (the guard re-pins pinned "
                    "plans), or use a fresh checkpoint."
                ) from e
            pinned = None  # stillborn checkpoint: replace below
        if pinned is None or _layout(pinned) != _layout(meta):
            if not has_state:
                # sidecar from a start that never committed a batch —
                # it pins a layout that never materialized; replace it
                _fs_write_text(fs, sidecar, json.dumps(meta), jvm)
                return
            raise ValueError(
                "checkpoint state-layout mismatch: this checkpoint was "
                f"created with key-bucket layout {_layout(pinned)}, but the "
                f"current plan resolved {_layout(meta)}. Resuming would "
                "silently merge rows into the wrong state buckets. Re-plan "
                "with the pinned values (e.g. StreamPlanner("
                "summer_key_buckets=<pinned int>) / key_buckets=<pinned "
                "int> on the service) or use a fresh checkpoint."
            )
        if has_state:
            _advise_bucket_drift(spark, checkpoint, meta)
        return
    if has_state:
        if _all_pinned(meta):
            # explicit ints are restart-deterministic — same contract the
            # pre-sidecar era relied on; adopt the layout and pin it.
            # Out loud (ADVICE r14): the guard cannot verify these ints
            # against what a pre-guard checkpoint actually ran with, and
            # once adopted the pin is permanent — a mistaken re-pin must
            # at least be visible in the logs.
            warnings.warn(
                f"checkpoint {checkpoint!r} has committed state but no "
                f"state-layout sidecar (pre-guard era): adopting and "
                f"PINNING the current plan's explicit layout "
                f"{_layout(meta)}. The guard cannot verify this matches "
                "the layout the checkpoint was created under — if these "
                "counts differ from the original ones, rows will merge "
                "into the wrong buckets; verify against the job that "
                "wrote it (pre-r11 default was per-key, r11+ default 64).",
                RuntimeWarning,
            )
            _fs_write_text(fs, sidecar, json.dumps(meta), jvm)
            return
        raise ValueError(
            f"checkpoint {checkpoint!r} contains committed state but no "
            "state-layout sidecar (it predates the layout guard), and the "
            "current plan resolved at least one key-bucket count via "
            "'auto'. Adopting the re-measured layout could silently merge "
            "rows into the wrong state buckets. Pin the count the "
            "checkpoint was created under (pre-r13 default: "
            "StreamPlanner(summer_key_buckets=64) / key_buckets=64 on the "
            "service) or use a fresh checkpoint."
        )
    fs.mkdirs(root)
    _fs_write_text(fs, sidecar, json.dumps(meta), jvm)


class StreamPlan:
    """A compiled streaming plan: the tail DataFrame plus sink effects.

    ``state_meta`` is the plan's resolved key-bucket layout (None for
    plans with no bucketed state); every start helper that takes a
    checkpoint pins it there via ``guard_state_checkpoint``."""

    def __init__(self, df: DataFrame, writes: list, state_meta=None):
        self.dataframe = df
        self.writes = writes
        self.state_meta = state_meta if state_meta is not None else getattr(
            df, "_sbspark_state_meta", None
        )

    def start_to_memory(self, spark, name: str, output_mode: str = "update", trigger_available_now: bool = True):
        q = (
            self.dataframe.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
        )
        if trigger_available_now:
            q = q.trigger(availableNow=True)
        return q.start()

    def start_foreach_batch(self, fn, output_mode: str = "update", checkpoint: Optional[str] = None, trigger_available_now: bool = True):
        q = self.dataframe.writeStream.foreachBatch(fn).outputMode(output_mode)
        if checkpoint:
            guard_state_checkpoint(self.dataframe, checkpoint, meta=self.state_meta)
            q = q.option("checkpointLocation", checkpoint)
        if trigger_available_now:
            q = q.trigger(availableNow=True)
        return q.start()

    def start_writes(self, checkpoint_root: str, output_mode: str = "append", trigger_available_now: bool = True):
        """Start one foreachBatch query per Written sink in the plan
        (each micro-batch DataFrame is handed to ``sink.write``).

        Each sink's per-write checkpoint is layout-guarded with the whole
        plan's resolved key-bucket fingerprint: a write branch downstream
        of a stateful op owns that op's state, and pinning the plan-wide
        layout on every sink keeps a multi-sink plan's checkpoints
        mutually consistent (one re-sized 'auto' restart refuses on ALL
        of them rather than corrupting the stateful one)."""
        queries = []
        for i, (sink, wdf) in enumerate(self.writes):
            ckpt = f"{checkpoint_root}/w{i}"
            guard_state_checkpoint(wdf, ckpt, meta=self.state_meta)
            q = (
                wdf.writeStream.foreachBatch(
                    lambda bdf, bid, s=sink: s.write(bdf)
                )
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
            )
            if trigger_available_now:
                q = q.trigger(availableNow=True)
            queries.append(q.start())
        return queries


class _NoProbeTwin(LookupError):
    """A streaming source in the probed prefix has no batch twin."""


#: session-lifetime memo for the 'auto' cardinality probe, keyed by
#: (probe plan's semanticHash, keys, state partitions). Re-planning the
#: same pipeline over the same files (bench passes, re-started queries in
#: one driver) costs one driver-side analysis instead of a ~0.5 s scan.
#: Deliberately NOT invalidated on corpus growth within a session: a
#: long-lived driver re-planning against the same checkpoint must keep
#: the same bucket count anyway (guard_state_checkpoint pins it); a new
#: process starts with an empty memo and re-measures.
_AUTO_PROBE_CACHE: dict = {}
_AUTO_PROBE_CACHE_MAX = 256

#: once-per-process flag for the twin-less 'auto' fallback INFO line
_TWINLESS_LOGGED = False


class _ProbePlanner(BatchPlanner):
    """Compiles a streaming DAG's prefix against each file source's BATCH
    twin (``Source.probe_loader``, attached by ``stream_source``) — the
    DAG is declarative, so its stateless Column program is identical in
    batch; stateful members compile under batch semantics, which is fine
    for a CARDINALITY estimate. Used for plan-time static probes such as
    ``summer_key_buckets="auto"``."""

    def _compile(self, node: g.Producer) -> DataFrame:
        if isinstance(node, g.Source):
            probe = getattr(node, "probe_loader", None)
            if probe is None:
                raise _NoProbeTwin(
                    f"source {node.source_name!r} has no batch twin "
                    "(probe_loader)"
                )
            df = probe(self.spark)
            if node.time_col and node.time_col != TIME_COL:
                df = df.withColumn(
                    TIME_COL, F.col(node.time_col).cast("timestamp")
                )
            elif TIME_COL not in df.columns:
                df = df.withColumn(
                    TIME_COL, F.lit("1970-01-01").cast("timestamp")
                )
            return df
        return super()._compile(node)


class StreamPlanner(BatchPlanner):
    """Reuses every stateless compile case from the batch planner; overrides
    the stateful/effect cases for the streaming execution model.

    ``summer_key_buckets``: physical state-key granularity for the summer
    — logical keys are hash-bucketed ``hash(k) % buckets`` before
    ``applyInPandasWithState`` (the reference keys its Summer bolt by
    hash(k)%shards, FinalFlatMap.scala:49-52). Default 64: at 8 state
    partitions that is 8 groups/partition — enough to balance, few enough
    that the per-group pandas↔Arrow round-trip amortizes over many keys.
    ``None`` restores per-key state (finest eviction granularity; pays
    one framework round-trip per key per trigger). ``"auto"`` (the
    DEFAULT since r13) sizes buckets from MEASURED key cardinality at
    plan time — it
    compiles the summer's stateless prefix against each file source's
    batch twin (``stream_source`` attaches one) and runs one
    column-pruned ``approx_count_distinct`` scan, then applies
    ``buckets = clamp(keys/100, 8, state_partitions×4096)``
    (``stateful.auto_key_buckets`` — the data-driven analog of the
    reference deriving Summer shards from parallelism ×
    SummerBatchMultiplier, StormTopologyBuilder.scala:291-298). A
    10⁸-key deployment on the static 64 would rewrite ~1.5M-key
    pickle dicts per touched bucket per trigger; auto picks ~2×10⁵
    buckets instead. TWIN-LESS SOURCES (rate/socket/live queues — no
    ``probe_loader`` batch twin to measure) fall back to the static 64
    BY DESIGN, logged once per process at INFO (not a warning: it is
    the documented default for unmeasurable sources, and a resumed
    checkpoint pins whatever was first resolved anyway); pass an int
    to choose the layout explicitly. Any OTHER probe failure (a
    stream-only service loader in the prefix, an AnalysisException)
    still warns out loud — those are unexpected.

    CHECKPOINT COMPATIBILITY — read before flipping settings on a live
    job: the bucket count is baked into the physical state layout
    (state key = hash(k) % buckets), and Spark cannot detect a count
    change across restarts (the schema is identical) — rows would
    silently merge into the wrong buckets. Under ``"auto"`` a restart
    after the corpus grew re-measures cardinality and may legitimately
    pick a new count, so every start helper that takes a checkpoint pins
    the resolved layout in ``<checkpoint>/_sbspark_key_buckets.json``
    and refuses a mismatched resume (``guard_state_checkpoint``). To
    resume a pre-r13 checkpoint (created under the old static default),
    pass ``summer_key_buckets=64`` explicitly; to resume an auto
    checkpoint after growth, pass the pinned int from the sidecar (or
    ``planner.last_auto_key_buckets`` of the original run)."""

    def __init__(
        self,
        spark,
        options=None,
        cache_fanout: bool = False,
        summer_key_buckets: "int | str | None" = "auto",
        summer_bootstrap_dir: Optional[str] = None,
    ):
        super().__init__(spark, options, cache_fanout)
        self.summer_key_buckets = summer_key_buckets
        #: replay-free state carry-in for a FRESH checkpoint (re-bucket
        #: migration): dir written by state_tools.export_summer_bootstrap
        #: at this planner's (int) summer_key_buckets; each bucket's
        #: first trigger seeds its totals from it. Also a per-name option.
        self.summer_bootstrap_dir = summer_bootstrap_dir
        #: per stateful node (structural key → resolution entry); plan()
        #: collects the entries reachable from its root in compile order
        self._kb_by_node: dict = {}
        #: resolved physical bucket count per stateful op of the LAST
        #: plan() call, in compile order — the state layout fingerprint
        #: guard_state_checkpoint pins to a checkpoint
        self.resolved_key_buckets: list = []

    def plan(self, node: g.Producer) -> StreamPlan:
        from ..batch.batcher import ensure_utc

        ensure_utc(self.spark)
        df = self.compile(node)
        # collected from THIS root's DAG (not a planner-lifetime
        # accumulator): planner reuse cannot leak another plan's entries
        # into the fingerprint, and memo-hit stateful subtrees still
        # contribute theirs (ADVICE r13)
        self.resolved_key_buckets = self._collect_compiled(
            node, self._kb_by_node
        )
        meta = None
        if self.resolved_key_buckets:
            meta = {"key_buckets": self.resolved_key_buckets}
            df._sbspark_state_meta = meta
            _logger.info(
                "stream plan resolved state layout: %s",
                [(e["keys"], e["key_buckets"]) for e in
                 self.resolved_key_buckets],
            )
        return StreamPlan(
            df,
            self._collect_compiled(node, self._writes_by_node),
            state_meta=meta,
        )

    def _compile(self, node: g.Producer) -> DataFrame:
        if isinstance(node, g.Observed):
            # streaming counters: named observed metrics, surfaced per
            # micro-batch in StreamingQueryProgress.observedMetrics
            # (read them with streaming.planner.observed_metrics)
            df = self.compile(node.parents[0])
            return df.observe(
                node.obs_name, *[c.alias(k) for k, c in node.metrics.items()]
            )
        if isinstance(node, g.Written):
            # streaming WrittenProducer: pass-through + a foreachBatch
            # effect started by StreamPlan.start_writes (StormSink analog)
            df = self.compile(node.parents[0])
            self._writes_by_node[self._skey(node)] = (node.sink, df)
            return df
        if isinstance(node, g.LeftJoin):
            return self._compile_left_join_streaming(node)
        if isinstance(node, g.Summer):
            return self._compile_summer_streaming(node)
        if isinstance(node, g.SummerUpdates):
            sg = sg_mod.get(node.summer.semigroup)
            df = self.compile(node.summer)
            return df.withColumn(
                node.summer.value_alias,
                sg.merge_null_safe(F.col("prev"), F.col("delta")),
            ).drop("prev", "delta")
        if isinstance(node, g.SummerSnapshot):
            raise TypeError(
                "streaming snapshot: write the summer to an OnlineStore via "
                "foreachBatch (run_summer_to_store), then read the store"
            )
        return super()._compile(node)

    def _compile_left_join_streaming(self, node: g.LeftJoin) -> DataFrame:
        """The online service-join family (OnlinePlan.scala:86-92 grouped
        leftJoin; FlatMapOperation.combine multiGet):

        * TemporalService → stateful as-of/running lookup
          (``streaming.temporal``), state = latest/running right value
          per key;
        * BufferService → watermarked stream-stream join
          (``streaming.joins``);
        * plain Service → inherited stream-static broadcast join.
        """
        from ..core.service import (
            BufferService,
            ExternalLookupService,
            StoreService,
            TemporalService,
        )

        if isinstance(node.service, ExternalLookupService):
            # the batch compile is a mapInPandas stage — valid on a
            # streaming DataFrame as-is (per-micro-batch batched IO)
            return super()._compile_left_join(node)
        if isinstance(node.service, StoreService):
            svc = node.service
            left = self.compile(node.parents[0])
            from ..core.graph import as_col
            from .temporal import streaming_self_loop

            with_delta = left.withColumn("__loop_delta__", as_col(svc.value))
            out = streaming_self_loop(
                with_delta, node.on, "__loop_delta__", svc.out_col,
                semigroup=svc.resolved_semigroup(), order_by=svc.order_by,
                key_buckets=self._resolve_key_buckets(
                    getattr(svc, "key_buckets", 64), node.parents[0],
                    node.on, node=node,
                    bootstrap_dir=getattr(svc, "bootstrap_dir", None),
                ),
                bootstrap_dir=getattr(svc, "bootstrap_dir", None),
            )
            return out.drop("__loop_delta__")
        if isinstance(node.service, TemporalService):
            svc = node.service
            left = self.compile(node.parents[0])
            right = self._resolve_service(svc)
            from .temporal import streaming_as_of_join

            return streaming_as_of_join(
                left, right, node.on, TIME_COL, svc.time_col,
                value_cols=svc.value_cols, mode=svc.mode,
                semigroup=svc.semigroup,
                max_age_seconds=svc.max_age_seconds,
                key_buckets=self._resolve_key_buckets(
                    getattr(svc, "key_buckets", 64), node.parents[0],
                    node.on, node=node,
                    bootstrap_dir=getattr(svc, "bootstrap_dir", None),
                ),
                bootstrap_dir=getattr(svc, "bootstrap_dir", None),
            )
        if isinstance(node.service, BufferService):
            svc = node.service
            left = self.compile(node.parents[0])
            right = self._resolve_service(svc)
            if TIME_COL in right.columns and svc.time_col != TIME_COL:
                right = right.drop(TIME_COL)
            from .joins import stream_stream_left_join

            return stream_stream_left_join(
                left, right, node.on, TIME_COL, svc.time_col,
                window=svc.window, watermark=svc.watermark,
            )
        return super()._compile_left_join(node)

    def _compile_summer_streaming(self, node: g.Summer) -> DataFrame:
        """Per-(key, batch) stateful aggregation emitting (prev, delta) per
        micro-batch — the online Summer bolt (online/executor/Summer.scala:
        56-128): prev is the state value of THIS (key, batch) before the
        trigger's delta merges in."""
        self._validate_loop_sandwich(node)
        sg = sg_mod.get(node.semigroup)
        batcher = node.batcher or b_mod.UNIT
        df = self.compile(node.parents[0])
        va = node.value_alias
        base = df.select(
            *node.keys,
            batcher.batch_col(F.col(TIME_COL)).alias("batch_id"),
            F.col(TIME_COL),
            node.value.alias(va),
        )
        # per-name override first (the reference's SummerParallelism
        # option class, scoped by .name() markers — Options.getFirst),
        # then the planner-wide default
        kb = self._opt("summer_key_buckets", self.summer_key_buckets)
        bd = self._opt("summer_bootstrap_dir", self.summer_bootstrap_dir)
        kb = self._resolve_key_buckets(
            kb, node.parents[0], node.keys, node=node, bootstrap_dir=bd
        )
        return stateful_summer(
            base, node.keys, va, sg, key_buckets=kb, bootstrap_dir=bd
        )

    def _resolve_key_buckets(
        self, kb, parent: g.Producer, keys, node: g.Producer = None,
        bootstrap_dir=None,
    ) -> "int | None":
        """Resolve a ``key_buckets`` setting: ints/None pass through;
        ``"auto"`` runs one plan-time approx_count_distinct over ``keys``
        evaluated on the BATCH twin of ``parent``'s stateless prefix (see
        class docstring). Used by the summer AND the temporal/loop
        services (their state is keyed by the join key, so the left
        side's key cardinality is the right estimate). Falls back to 64
        (static default) on ANY probe failure — a sizing heuristic must
        never kill the plan: no batch twin (_NoProbeTwin), a stream-only
        service loader in the prefix, an AnalysisException from a
        batch-incompatible prefix — all degrade out loud.

        Every resolution is recorded against the stateful ``node``'s
        structural key (with an ``auto`` provenance flag — the guard's
        adoption rules distinguish restart-deterministic pinned layouts
        from re-measured ones); ``plan()`` collects its DAG's entries
        into ``self.resolved_key_buckets``, the state-layout fingerprint
        ``guard_state_checkpoint`` pins per checkpoint."""
        keys = [keys] if isinstance(keys, str) else list(keys)
        is_auto = kb == "auto"
        if is_auto and bootstrap_dir is not None:
            # 'auto' re-measures the GO-FORWARD corpus, which will
            # essentially never equal the export's new_key_buckets — and a
            # mismatched count seeds silent partial state. The manifest
            # check downstream would catch the mismatch, but only
            # coincidental equality would pass, so refuse the combination
            # outright: a bootstrap pins the layout (VERDICT r14; the
            # reference pins one shard layout per topology,
            # StormTopologyBuilder.scala:291-298).
            raise ValueError(
                "key_buckets='auto' cannot be combined with a "
                f"bootstrap_dir ({bootstrap_dir!r}): the export pinned a "
                "bucket count, and 'auto' re-measures the go-forward "
                "corpus instead of honoring it. Pass the export's "
                "new_key_buckets (see its _manifest.json) explicitly."
            )

        def record(resolved):
            entry = {"keys": keys, "key_buckets": resolved, "auto": is_auto}
            if node is not None:
                self._kb_by_node[self._skey(node)] = entry
            return resolved

        if kb != "auto":
            return record(None if kb is None else int(kb))
        import warnings

        from .stateful import auto_key_buckets

        try:
            probe_df = _ProbePlanner(self.spark, self.options).compile(parent)
            parts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            try:
                memo_key = (probe_df.semanticHash(), tuple(keys), parts)
            except Exception:  # noqa: BLE001 — memo is best-effort
                memo_key = None
            if memo_key is not None and memo_key in _AUTO_PROBE_CACHE:
                chosen = _AUTO_PROBE_CACHE[memo_key]
            else:
                chosen = auto_key_buckets(probe_df, keys, parts)
                if memo_key is not None:
                    while len(_AUTO_PROBE_CACHE) >= _AUTO_PROBE_CACHE_MAX:
                        # drop-oldest (insertion-ordered dict), not clear()
                        del _AUTO_PROBE_CACHE[next(iter(_AUTO_PROBE_CACHE))]
                    _AUTO_PROBE_CACHE[memo_key] = chosen
        except _NoProbeTwin as e:
            # the DOCUMENTED default for unmeasurable sources (rate/
            # socket/queue): not a fault, so log once per process at
            # INFO instead of warning on every (re)plan (VERDICT r15
            # item 6 — resumes were emitting a RuntimeWarning per start)
            global _TWINLESS_LOGGED
            if not _TWINLESS_LOGGED:
                _TWINLESS_LOGGED = True
                import logging

                logging.getLogger(__name__).info(
                    "key_buckets='auto': %s; using the static default 64 "
                    "(documented twin-less fallback — pass an int to "
                    "choose the layout)", e,
                )
            return record(64)
        except Exception as e:  # noqa: BLE001
            warnings.warn(
                f"key_buckets='auto' probe failed ({type(e).__name__}:"
                f" {e}); using the static default 64 — pass an int to"
                " silence this",
                RuntimeWarning,
            )
            return record(64)
        self.last_auto_key_buckets = chosen  # introspection/test hook
        return record(chosen)


class CumulativeCounters:
    """Job-lifetime counters for streaming plans — accumulates every
    observation's numeric metrics across triggers via a
    StreamingQueryListener (the reference's cumulative counters surface,
    Stats/SummingbirdRuntimeStats: counters are totals over the job, not
    per-trigger snapshots; ``observed_metrics`` below gives the per-trigger
    view).

    Usage::

        counters = CumulativeCounters().attach(spark)
        ... run queries with .observe(...) nodes ...
        counters.wait_for("my_obs")          # listener events are async
        counters.totals["my_obs"]["n"]

    Numeric fields sum across triggers; non-numeric fields keep the latest
    value.
    """

    def __init__(self):
        self.totals: dict = {}
        self._listener = None

    def _accumulate(self, progress) -> None:
        om = progress.observedMetrics if hasattr(progress, "observedMetrics") else None
        if not om:
            return
        for name, row in om.items():
            d = row.asDict() if hasattr(row, "asDict") else dict(row)
            tot = self.totals.setdefault(name, {})
            for k, v in d.items():
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    tot[k] = v
                elif v is not None:
                    tot[k] = tot.get(k, 0) + v

    def attach(self, spark: SparkSession) -> "CumulativeCounters":
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                outer._accumulate(event.progress)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        if self._listener is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None

    def wait_for(self, obs_name: str, timeout_s: float = 30.0,
                 until=None) -> dict:
        """Listener delivery is asynchronous: block until the named
        observation has arrived — and, when ``until(totals)`` is given,
        until that predicate holds (e.g. a known expected count; without
        it an early trigger's totals may be returned while later events
        are still in flight)."""
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            t = self.totals.get(obs_name)
            if t is not None and (until is None or until(t)):
                return t
            time.sleep(0.1)
        raise TimeoutError(f"observed metrics {obs_name!r}: not arrived/satisfied")


def observed_metrics(query) -> dict:
    """Accumulated observed metrics across a query's progress events:
    {observation_name: [per-trigger row dicts]} — the streaming face of
    Producer.observe (batch reads BatchPlan.observations instead)."""
    out: dict = {}
    for p in query.recentProgress:
        om = p.get("observedMetrics") if isinstance(p, dict) else p.observedMetrics
        if not om:
            continue
        for name, row in om.items():
            out.setdefault(name, []).append(
                row.asDict() if hasattr(row, "asDict") else dict(row)
            )
    return out
