"""Services — lookup tables for left joins.

The reference's ``Service[K, V]`` abstract type (Platform.scala:22-34;
memory impl Memory.scala:39-41; scalding impls Service.scala:29-54). In
Spark a service is a dimension DataFrame; small ones broadcast (the
storehaus ReadableStore multiGet analog without per-event IO —
online/FlatMapOperation.scala:101-137).

Temporal services (BatchedService snapshot+changelog as-of semantics) live
in ``operators.asof``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession


class Service:
    """A keyed lookup table. ``loader``: DataFrame | path | (spark)->DataFrame."""

    def __init__(
        self,
        loader: Union[DataFrame, str, Callable[[SparkSession], DataFrame]],
        key_cols: Optional[Sequence[str]] = None,
        broadcast: bool = True,
    ):
        self._loader = loader
        self.key_cols = list(key_cols) if key_cols else None
        self.broadcast_hint = broadcast

    def dataframe(self, spark: SparkSession) -> DataFrame:
        ld = self._loader
        if isinstance(ld, DataFrame):
            return ld
        if isinstance(ld, str):
            return spark.read.parquet(ld)
        return ld(spark)


class EmptyService(Service):
    """Always-None join (scalding/service/EmptyService.scala)."""

    def __init__(self, schema: str):
        def load(spark: SparkSession) -> DataFrame:
            return spark.createDataFrame([], schema)

        super().__init__(load)


class ExternalLookupService(Service):
    """A Python-callable lookup — the storehaus ReadableStore multiGet
    analog (online/FlatMapOperation.scala:101-137 ``combine``: service
    lookups batched inside the flatMap operator, never per-event IO).

    ``fetch(keys) -> dict`` is called ONCE per Arrow batch with that
    batch's unique keys (scalars for a single join column, tuples
    otherwise) and returns ``{key: value-tuple-or-scalar}``; missing keys
    join as NULLs. ``value_schema`` is the DDL of the appended columns
    (e.g. ``"label string, score double"``). Both planners compile
    ``left_join`` against it to a ``mapInPandas`` stage, so the same DAG
    does batched RPC enrichment in batch and on a stream.
    """

    def __init__(self, fetch: Callable, value_schema: str):
        super().__init__(loader=None, broadcast=False)
        self.fetch = fetch
        self.value_schema = value_schema

    def dataframe(self, spark):  # pragma: no cover - defensive
        raise TypeError(
            "ExternalLookupService has no DataFrame; it compiles inside "
            "left_join as a batched mapInPandas lookup"
        )


class TemporalService(Service):
    """A changelog-backed temporal service: ``left_join`` against it sees
    the right value AS OF each left event's time, not a static snapshot.

    ``mode='latest'`` is the BatchedService snapshot+changelog lookup
    (scalding/batch/BatchedService.scala:37-99; NULL value rows are
    deletions); ``mode='sum'`` is the StoreService running-total join
    (ScaldingPlatform.scala:402-428 LookupJoin.rightSumming). The batch
    planner compiles this to ``operators.asof.as_of_join`` (one-shuffle
    union+window); the streaming planner to a per-key stateful lookup
    (``streaming.temporal``) — the reference's online service join
    (online/FlatMapOperation.scala:101-137, OnlinePlan.scala:86-92).

    ``loader`` may be a DataFrame, parquet path, ``spark -> DataFrame``
    callable, or a Producer (use a ``stream_source`` Producer to make the
    changelog itself a stream). ``max_age_seconds`` is the
    BatchedWindowService visibility bound — EXCLUSIVE, 0 <= t_l − t_r <
    window (BatchedWindowService.scala:35-72) — in both modes: latest
    hides an aged-out value, sum becomes the windowed running total
    (batch: µs RANGE frame; streaming: retraction-buffer state).
    """

    def __init__(
        self,
        loader,
        time_col: str,
        mode: str = "latest",
        semigroup="sum",
        value_cols: Optional[Sequence[str]] = None,
        max_age_seconds: Optional[float] = None,
        key_buckets: "int | str | None" = 64,
        bootstrap_dir: Optional[str] = None,
    ):
        if mode not in ("latest", "sum"):
            raise ValueError(f"TemporalService mode {mode!r}: 'latest' or 'sum'")
        super().__init__(loader, broadcast=False)
        self.time_col = time_col
        self.mode = mode
        self.semigroup = semigroup
        self.value_cols = list(value_cols) if value_cols else None
        self.max_age_seconds = max_age_seconds
        #: replay-free state carry-in for a FRESH checkpoint (re-bucket
        #: migration): dir from state_tools.export_keyed_bootstrap at
        #: this service's (int) key_buckets
        self.bootstrap_dir = bootstrap_dir
        # streaming-planner state granularity (hash(on)%buckets; None =
        # per-key; "auto" sizes from the LEFT side's measured join-key
        # cardinality like the summer). The default stays a PINNED 64,
        # unlike the summer's 'auto': this kernel is vectorized ACROSS
        # keys within a bucket, so its wall optimum is keys-INDEPENDENT —
        # measured flat at 64-256 buckets from 1.4k to 145k keys and
        # strictly worse beyond (512: +40%, 1508: +90% at a 145k-key
        # all-touched trigger; the ~3-6 ms/group framework tax dominates
        # once buckets exceed needed parallelism). 'auto' only pays off
        # for low per-trigger touch fractions over huge keysets (write
        # amplification), which is a deployment property no plan-time
        # probe can see — opt in explicitly. See SCALING.md round-13.
        # Ignored by the batch planner (one-shuffle union+window, no
        # state).
        self.key_buckets = key_buckets


class StoreService(Service):
    """The self-referential store lookup: ``left_join`` against the store
    fed by this very stream's summer — the reference's loop join
    (ScaldingPlatform.scala:430-469 detects it; scalding/Service.scala:78-105
    validates that only value-transforms sit between join and summer;
    196-269 is the per-key time-sorted scanLeft).

    Each left event's ``out_col`` is the store value accumulated from
    *prior* events of its key — ``value`` (a Column expression over the
    left frame) folded with ``semigroup``, seeded by ``store``'s last
    snapshot when one exists. Linear semigroups compile to a JVM window
    running-aggregate (one sort-shuffle, codegen); others to a bounded
    collect+fold window. State-dependent transforms (delta depends on the
    observed state) cannot be a Column expression — use
    ``operators.loopjoin.loop_join`` with a Python transform.

    The batch planner also validates the sandwich: a downstream
    ``sum_by_key(store=<same store>)`` must be separated from this join by
    value-transforms only, with a matching semigroup.
    """

    def __init__(
        self,
        store=None,
        value="value",
        semigroup=None,
        out_col: str = "joined",
        order_by: Optional[Sequence[str]] = None,
        key_buckets: "int | str | None" = 64,
        bootstrap_dir: Optional[str] = None,
    ):
        super().__init__(loader=None, broadcast=False)
        self.store = store
        self.value = value
        self.semigroup = semigroup
        self.out_col = out_col
        self.order_by = list(order_by) if order_by else []
        #: replay-free state carry-in for a FRESH checkpoint (re-bucket
        #: migration): dir from state_tools.export_keyed_bootstrap at
        #: this service's (int) key_buckets
        self.bootstrap_dir = bootstrap_dir
        # streaming state granularity; pinned 64 by default (NOT 'auto'):
        # the loop-join kernel vectorizes across keys within a bucket, so
        # its wall optimum is keys-independent — see TemporalService's
        # key_buckets note and SCALING.md round-13 for the measurement.
        self.key_buckets = key_buckets

    def resolved_semigroup(self):
        if self.semigroup is not None:
            return self.semigroup
        if self.store is not None:
            return self.store.semigroup
        return "sum"

    def dataframe(self, spark):  # pragma: no cover - defensive
        raise TypeError(
            "StoreService is not a dimension table; it compiles inside "
            "left_join as the loop-join state"
        )


class BufferService(Service):
    """A stream-stream buffer (Producer.scala:396-399: ``Buffer[K, V] =
    Service + Sink`` — one stream writes, the other looks up recent
    writes). ``left_join`` against it matches right events of the same key
    within ``window`` BEFORE the left event. Streaming compiles to a
    watermarked stream-stream join (``streaming.joins``); batch replays the
    same semantics as a time-range theta join (backfill parity — the
    reference has no offline Buffer impl at all)."""

    def __init__(self, loader, time_col: str, window: str = "1 hour",
                 watermark: str = "1 hour"):
        super().__init__(loader, broadcast=False)
        self.time_col = time_col
        self.window = window
        self.watermark = watermark
