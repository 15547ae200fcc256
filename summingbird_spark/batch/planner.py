"""Batch planner: Producer DAG → DataFrame (Catalyst does the rest).

The Spark analog of the reference's Scalding ``buildFlow`` recursion
(summingbird-scalding/.../ScaldingPlatform.scala:322-579): one case per node
kind, memoized per node so diamond fan-outs compile once
(ScaldingPlatform.scala:343-359 forceNode/memoize — Catalyst's
ReusedExchange covers the physical side within one action).

Where the reference hand-plans shuffle avoidance (map-side partial
aggregation, key-shard edges — SURVEY §4.2/§4.3), we declare the logical
plan and rely on Catalyst: partial aggregation, EnsureRequirements
partitioning, predicate pushdown, and whole-stage codegen are automatic.
Custom logic is confined to exactly what Catalyst lacks (SURVEY §4.5):
the semigroup prev/delta window and store rollforward.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core import graph as g
from ..core import semigroup as sg_mod
from ..core.graph import TIME_COL
from . import batcher as b_mod

# Semigroups whose window fold is itself a builtin window aggregate —
# keeps the prev/delta computation in whole-stage codegen (no arrays).
# Each entry: (col, window) -> Column.  TWO tables because the two call
# sites fold DIFFERENT inputs (the r7 single-table version silently
# corrupted the summer's prev for semigroup='count'):
#
# _WINDOW_MERGE_RAW — loop-join site (`_compile_loop_join`): the window
# rows are RAW prior events, so the fold is merge(lift(event)...).  For
# count, lift(v)=1 per non-null event ⇒ F.count of the window, NULL
# before the first fold (F.count over an empty window is 0).
_WINDOW_MERGE_RAW = {
    "sum": lambda c, w: F.sum(c).over(w),
    "sum_long": lambda c, w: F.sum(c).over(w).cast("long"),
    "count": lambda c, w: F.when(F.count(c).over(w) > 0, F.count(c).over(w)),
    "min": lambda c, w: F.min(c).over(w),
    "max": lambda c, w: F.max(c).over(w),
}
# _WINDOW_MERGE_CARRIER — summer site (`_compile_summer`): the window
# rows are per-batch CARRIER aggregates already produced by sg.agg (for
# count, a tally per batch), so the fold is merge(carrier...).  Count's
# carrier merge is +, i.e. F.sum of the prior tallies — F.count here
# would re-count each prior batch as 1 (prev None,1,2,3 instead of
# None,30,60,90 for 30-event batches).  F.sum over an empty window is
# already NULL, the wanted "no previous" sentinel.
_WINDOW_MERGE_CARRIER = {
    "sum": lambda c, w: F.sum(c).over(w),
    "sum_long": lambda c, w: F.sum(c).over(w).cast("long"),
    "count": lambda c, w: F.sum(c).over(w).cast("long"),
    "min": lambda c, w: F.min(c).over(w),
    "max": lambda c, w: F.max(c).over(w),
}


def _with_commutativity(sg, commutative: bool):
    """Shallow override of a semigroup's declared commutativity
    (option/Commutativity.scala:23-48: commutativity is declared, not
    inferred — declaring non-commutative forces the time-sorted fold)."""
    import copy

    out = copy.copy(sg)
    out.commutative = bool(commutative)
    return out


class BatchPlan:
    """Compiled plan: a result DataFrame plus deferred sink writes
    (the reference's FlowToPipe + write effects, scalding/Sink.scala:19-21)."""

    def __init__(self, df: DataFrame, writes: list):
        self.dataframe = df
        self.writes = writes
        self.observations: dict[str, object] = {}

    def run(self) -> DataFrame:
        for sink, wdf in self.writes:
            sink.write(wdf)
        return self.dataframe


def dependants(tail: g.Producer, keyfn=id) -> dict:
    """Fan-out count per node — the Dependants graph analog
    (core/.../Dependants.scala:25-60): how many distinct children consume
    each producer in the DAG reachable from ``tail``. ``keyfn`` picks the
    node identity: planners pass the structural key, so two value-equal
    subtrees count as ONE node with two consumers (dagon's Literal-graph
    collapsing)."""
    counts: dict = {}
    seen: set = set()

    def walk(n: g.Producer):
        for p in n.parents:
            k = keyfn(p)
            counts[k] = counts.get(k, 0) + 1
            # dedupe the walk by the SAME key used for counting: deduping
            # by id(p) would walk both copies of a value-equal subtree and
            # double-count every shared structural ancestor's fan-out,
            # triggering spurious cache() under cache_fanout
            if k not in seen:
                seen.add(k)
                walk(p)

    walk(tail)
    return counts


class BatchPlanner:
    """``options`` resolves per-name knobs (core.options.Options);
    ``cache_fanout`` persists nodes consumed by >1 child — the forceNode
    analog (ScaldingPlatform.scala:343-359). Within a single action
    Catalyst's ReusedExchange already avoids recompute, so caching matters
    mainly for multi-write plans (``also`` / several sinks)."""

    def __init__(self, spark: SparkSession, options=None, cache_fanout: bool = False):
        self.spark = spark
        self.options = options
        self.cache_fanout = cache_fanout
        self._memo: dict = {}
        # write effects keyed by the Written node's STRUCTURAL key, not a
        # planner-lifetime list: plan() collects the entries reachable
        # from ITS root, so reusing one planner for a second plan() call
        # neither leaks the first DAG's sinks into the second plan nor
        # loses memo-hit sinks (ADVICE r13 planner-reuse class)
        self._writes_by_node: dict = {}
        self._fanout: dict = {}
        self._name_stack: list[str] = []
        self.observations: dict[str, object] = {}
        # per-planner structural-key memo (node graphs are immutable, so
        # keys are stable across plan()/compile() calls on one planner)
        self._skmemo: dict = {}

    def plan(self, node: g.Producer) -> BatchPlan:
        # batch_col mixes unix_millis with calendar functions — they only
        # agree under a UTC session (CalendarBatcher.scala:120-124)
        b_mod.ensure_utc(self.spark)
        self._fanout = dependants(node, keyfn=self._skey)
        df = self.compile(node)
        plan = BatchPlan(df, self._collect_compiled(node, self._writes_by_node))
        plan.observations = self.observations
        return plan

    def _aux_children(self, n: g.Producer) -> list:
        """Producer subtrees a node compiles that are NOT in ``parents``:
        a LeftJoin's service when the service IS a Producer or wraps one
        (``_resolve_service`` compiles ``service`` / ``service._loader``
        with this planner). Without these, a Written sink or stateful op
        living inside a service-wrapped changelog DAG would be compiled —
        and recorded — but invisible to the per-plan collection below
        (dropped sink starts / an unguarded state-layout entry)."""
        svc = getattr(n, "service", None)
        if isinstance(svc, g.Producer):
            return [svc]
        if svc is not None and isinstance(
            getattr(svc, "_loader", None), g.Producer
        ):
            return [svc._loader]
        return []

    def _collect_compiled(self, node: g.Producer, table: dict) -> list:
        """Collect per-plan artifacts recorded during compile (keyed by
        structural key in ``table``) for the nodes reachable from THIS
        plan's root, in deterministic post-order — i.e. compile order.
        Reaches service-wrapped Producer subtrees too (_aux_children).
        Robust to planner reuse (a second plan() on the same planner sees
        only its own DAG's entries) and to memo hits (an already-compiled
        subtree's entries are still collected)."""
        out, seen, stack = [], set(), [(node, False)]
        while stack:
            n, expanded = stack.pop()
            key = self._skey(n)
            if expanded:
                if key in table:
                    out.append(table[key])
                continue
            if key in seen:
                continue
            seen.add(key)
            stack.append((n, True))
            for p in reversed([*n.parents, *self._aux_children(n)]):
                stack.append((p, False))
        return out

    def _opt(self, key: str, default=None):
        if self.options is None:
            return default
        return self.options.get_first(list(reversed(self._name_stack)), key, default)

    def _skey(self, node: g.Producer):
        return g.structural_key(node, self._skmemo)

    def compile(self, node: g.Producer) -> DataFrame:
        # memoized by STRUCTURAL key (dagon analog, VERDICT r5 missing
        # item 3): value-equal subtrees built as distinct objects compile
        # to the same DataFrame, and cache_fanout sees their combined
        # fan-out — a by-value diamond caches once instead of recomputing
        key = self._skey(node)
        if key not in self._memo:
            df = self._compile(node)
            if (
                self.cache_fanout
                and self._fanout.get(key, 0) > 1
                and not isinstance(node, g.Source)
            ):
                df = df.cache()
            self._memo[key] = df
        return self._memo[key]

    # ---- per-node cases (ScaldingPlatform.scala:368-579 analog) --------
    def _compile(self, node: g.Producer) -> DataFrame:
        if isinstance(node, g.Source):
            df = node.loader(self.spark)
            if node.time_col and node.time_col != TIME_COL:
                df = df.withColumn(TIME_COL, F.col(node.time_col).cast("timestamp"))
            elif TIME_COL not in df.columns:
                # timeless source: constant epoch time (Batcher.unit world)
                df = df.withColumn(TIME_COL, F.lit("1970-01-01").cast("timestamp"))
            return df

        if isinstance(node, g.MapCols):
            df = self.compile(node.parents[0])
            df = df.withColumns(dict(node.cols))
            if node.drop:
                df = df.drop(*node.drop)
            return df

        if isinstance(node, g.Select):
            df = self.compile(node.parents[0])
            cols = [F.col(TIME_COL)] if TIME_COL not in node.keep else []
            cols += [F.col(c) for c in node.keep]
            cols += [c.alias(a) for a, c in node.named.items()]
            return df.select(*cols)

        if isinstance(node, g.Filter):
            return self.compile(node.parents[0]).where(node.predicate)

        if isinstance(node, g.FlatMap):
            df = self.compile(node.parents[0])
            keep = [F.col(TIME_COL), *[F.col(c) for c in node.keep]]
            return df.select(*keep, F.explode(node.expr).alias(node.alias))

        if isinstance(node, g.ExplodeKeep):
            df = self.compile(node.parents[0])
            others = [c for c in df.columns if c not in (*node.drop, node.alias)]
            return df.select(*others, F.explode(node.expr).alias(node.alias))

        if isinstance(node, g.Transform):
            return node.fn(self.compile(node.parents[0]))

        if isinstance(node, g.MapInPandas):
            return self.compile(node.parents[0]).mapInPandas(node.fn, node.schema)

        if isinstance(node, g.Merged):
            left = self.compile(node.parents[0])
            right = self.compile(node.parents[1])
            return left.unionByName(right, allowMissingColumns=True)

        if isinstance(node, g.Named):
            # scope options over the named subtree (StripNamedNodes +
            # Options.getFirst innermost-wins semantics)
            self._name_stack.append(node.node_name)
            try:
                return self.compile(node.parents[0])
            finally:
                self._name_stack.pop()

        if isinstance(node, g.Written):
            df = self.compile(node.parents[0])
            self._writes_by_node[self._skey(node)] = (node.sink, df)
            return df

        if isinstance(node, g.Also):
            effects = node.parents[0]
            self.compile(effects)  # register its writes
            return self.compile(node.parents[1])

        if isinstance(node, g.LeftJoin):
            return self._compile_left_join(node)

        if isinstance(node, g.Observed):
            from pyspark.sql import Observation

            df = self.compile(node.parents[0])
            obs = Observation()
            self.observations[node.obs_name] = obs
            return df.observe(obs, *[c.alias(k) for k, c in node.metrics.items()])

        if isinstance(node, g.Repartition):
            df = self.compile(node.parents[0])
            if node.cols:
                return df.repartition(node.num, *node.cols) if node.num else df.repartition(*node.cols)
            return df.repartition(node.num)

        if isinstance(node, g.Summer):
            return self._compile_summer(node)

        if isinstance(node, g.SummerUpdates):
            summer = node.summer
            sg = sg_mod.get(summer.semigroup)
            df = self.compile(summer)
            return df.withColumn(
                summer.value_alias, sg.merge_null_safe(F.col("prev"), F.col("delta"))
            ).drop("prev", "delta")

        if isinstance(node, g.SummerSnapshot):
            return self._compile_snapshot(node.summer)

        raise TypeError(f"batch planner: unknown node {type(node).__name__}")

    # ---- joins ---------------------------------------------------------
    def _resolve_service(self, service) -> DataFrame:
        if isinstance(service, DataFrame):
            return service
        if isinstance(service, g.Producer):
            return self.compile(service)
        if isinstance(getattr(service, "_loader", None), g.Producer):
            # a Service wrapping a Producer DAG (e.g. a stream_source
            # changelog): compile it with THIS planner so batch/stream each
            # get their own execution of the same logical service
            return self.compile(service._loader)
        if hasattr(service, "dataframe"):
            return service.dataframe(self.spark)
        if callable(service):
            return service(self.spark)
        raise TypeError(f"cannot resolve service {service!r}")

    def _compile_left_join(self, node: g.LeftJoin) -> DataFrame:
        """Key-equi left join vs a dimension snapshot
        (scalding/service/SimpleService.scala:34-41,
        UniqueKeyedService.doJoin:40-55). Small dims broadcast —
        the storehaus-lookup analog without per-event IO.

        Temporal/buffer services route to their own physical joins:
        TemporalService → as_of_join (BatchedService/StoreService
        semantics); BufferService → time-range theta join (the batch
        replay of the online Buffer, Producer.scala:396-399)."""
        from ..core.service import (
            BufferService,
            ExternalLookupService,
            StoreService,
            TemporalService,
        )

        if isinstance(node.service, ExternalLookupService):
            return self._compile_external_lookup(node)
        if isinstance(node.service, StoreService):
            return self._compile_loop_join(node)
        if isinstance(node.service, TemporalService):
            svc = node.service
            left = self.compile(node.parents[0])
            right = self._resolve_service(svc)
            from ..operators.asof import as_of_join

            return as_of_join(
                left,
                right.drop(TIME_COL) if TIME_COL in right.columns
                and svc.time_col != TIME_COL else right,
                node.on,
                TIME_COL,
                svc.time_col,
                value_cols=svc.value_cols,
                mode=svc.mode,
                semigroup=svc.semigroup,
                # plain number, not Column: sum mode turns it into a long
                # RANGE-frame bound (latest wraps it into a lit itself)
                max_age=svc.max_age_seconds,
            )
        if isinstance(node.service, BufferService):
            svc = node.service
            left = self.compile(node.parents[0])
            right = self._resolve_service(svc)
            if TIME_COL in right.columns and svc.time_col != TIME_COL:
                right = right.drop(TIME_COL)
            from ..streaming.joins import stream_stream_left_join

            return stream_stream_left_join(
                left, right, node.on, TIME_COL, svc.time_col,
                window=svc.window, watermark=None,
            )
        left = self.compile(node.parents[0])
        right = self._resolve_service(node.service)
        if TIME_COL in right.columns:
            right = right.drop(TIME_COL)
        bcast = node.broadcast
        if bcast is None:
            bcast = self._opt("broadcast", getattr(node.service, "broadcast_hint", False))
        if bcast:
            right = F.broadcast(right)
        return left.join(right, on=node.on, how="left")

    def _compile_external_lookup(self, node: g.LeftJoin) -> DataFrame:
        """Batched external lookups (FlatMapOperation.combine multiGet):
        one fetch() per Arrow batch over its unique keys, inside
        mapInPandas — IO amplification is 1/batch, not 1/event, and the
        same stage runs unchanged on streaming DataFrames."""
        svc = node.service
        left = self.compile(node.parents[0])
        on = list(node.on)
        fetch = svc.fetch
        in_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        schema = ", ".join(in_fields) + ", " + svc.value_schema
        val_names = [c.split()[0].strip("`") for c in svc.value_schema.split(",")]
        single = len(on) == 1

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                if single:
                    keys = pdf[on[0]]
                    uniq = list(pd.unique(keys))
                else:
                    keys = list(zip(*[pdf[c] for c in on]))
                    uniq = list(dict.fromkeys(keys))
                got = fetch(uniq) if uniq else {}
                out = pdf.copy()
                rows = [got.get(k) for k in keys]
                for i, vn in enumerate(val_names):
                    if len(val_names) == 1:
                        out[vn] = [
                            (r[0] if isinstance(r, (tuple, list)) else r)
                            if r is not None else None
                            for r in rows
                        ]
                    else:
                        out[vn] = [r[i] if r is not None else None for r in rows]
                yield out

        return left.mapInPandas(gen, schema)

    def _compile_loop_join(self, node: g.LeftJoin) -> DataFrame:
        """Loop join (ScaldingPlatform.scala:430-469; scanLeft semantics
        Service.scala:196-269): ``out_col`` = the store value accumulated
        from PRIOR events of the key — a per-key running fold of the
        service's delta expression, seeded by the store's last snapshot.
        Linear semigroups stay in a JVM window aggregate (codegen, one
        sort-shuffle — the same single reducer pass the reference plans);
        other semigroups use a bounded collect+fold window."""
        svc = node.service
        left = self.compile(node.parents[0])
        sg = sg_mod.get(svc.resolved_semigroup())
        delta = g.as_col(svc.value)
        w = (
            Window.partitionBy(*node.on)
            .orderBy(F.col(TIME_COL), *[F.col(c) for c in svc.order_by])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        if sg.name in _WINDOW_MERGE_RAW:
            running = _WINDOW_MERGE_RAW[sg.name](delta, w)
        else:
            # fold LIFTED deltas (set folds [v], moments folds power
            # sums): the store this join observes accumulates lifted
            # values through the summer, and the streaming compile of the
            # same DAG (streaming_self_loop) folds py_lift(v) — raw-merge
            # here would silently diverge batch from stream for every
            # non-identity carrier
            vals = F.collect_list(sg.lift(delta)).over(w)
            running = F.when(F.size(vals) == 0, F.lit(None)).otherwise(
                F.aggregate(
                    F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
                    F.element_at(vals, 1),
                    lambda a, b: sg.merge(a, b),
                )
            )
        out = left.withColumn(svc.out_col, running)
        snap = svc.store.read_last(self.spark) if svc.store is not None else None
        if snap is not None:
            # seed each key's fold with the committed snapshot (the
            # reference reads the store's last batch the same way)
            init = snap[1].select(
                *[
                    F.col(kc).alias(on_c)
                    for kc, on_c in zip(svc.store.key_cols, node.on)
                ],
                F.col("value").alias("__init__"),
            )
            out = (
                out.join(init, on=node.on, how="left")
                .withColumn(
                    svc.out_col,
                    sg.merge_null_safe(F.col("__init__"), F.col(svc.out_col)),
                )
                .drop("__init__")
            )
        return out

    def _validate_loop_sandwich(self, node: g.Summer) -> None:
        """Reject a loop join separated from its summer by anything other
        than value-transforms (Service.scala:78-105): flatMaps, merges, or
        re-keying between them would change what the store accumulates."""
        from ..core.service import StoreService

        allowed = (
            g.MapCols, g.Select, g.Filter, g.Named, g.Observed,
            g.Repartition, g.Written,
        )
        bad = None
        cur = node.parents[0]
        while True:
            if isinstance(cur, g.LeftJoin):
                svc = cur.service
                if (
                    isinstance(svc, StoreService)
                    and node.store is not None
                    and svc.store is node.store
                ):
                    if bad is not None:
                        raise TypeError(
                            "loop join: only value-transforms (map/select/"
                            "filter/name/observe/write) may sit between the "
                            "StoreService left_join and sum_by_key on the "
                            f"same store; found {type(bad).__name__} "
                            "(Service.scala:78-105)"
                        )
                    ssg = sg_mod.get(svc.resolved_semigroup()).name
                    nsg = sg_mod.get(node.semigroup).name
                    if ssg != nsg:
                        raise TypeError(
                            f"loop join: service folds with {ssg!r} but the "
                            f"summer aggregates with {nsg!r} — the observed "
                            "state would diverge from the store"
                        )
                    break
                # a LeftJoin on some OTHER service is not a value-transform
                # (a dup-keyed dimension duplicates left rows): record it
                # and KEEP WALKING — the matching StoreService join may sit
                # deeper in the chain and still needs validation
                if bad is None:
                    bad = cur
            elif not isinstance(cur, allowed) and bad is None:
                bad = cur
            if not cur.parents:
                break
            cur = cur.parents[0]

    # ---- the Summer (SURVEY §2.1 #24, §4.3) -----------------------------
    def _summer_parts(self, node: g.Summer):
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
        return sg, batcher, base, va

    def _per_batch_delta(self, sg, base: DataFrame, keys, va: str) -> DataFrame:
        """Per-(key, batch) partial sums — map-side combine is automatic
        (the reference hand-builds this: BatchedStore.scala:115-130
        sumByBatches; FinalFlatMap map-side caches)."""
        if sg.commutative:
            return base.groupBy(*keys, "batch_id").agg(
                sg.agg(F.col(va)).alias("delta"), F.max(TIME_COL).alias(TIME_COL)
            )
        # non-commutative ⇒ time-sorted fold (BatchedStore.scala:199-203).
        # Default is one collect+sort per (key, batch) — bounded by the
        # key's per-batch event count. For hot keys set the per-name
        # option `ordered_chunk_ms`: a two-phase ordered fold (fold within
        # time chunks, then fold the chunk results in chunk order —
        # associativity makes the split exact) bounds each buffer by the
        # chunk's events / the batch's chunk count, at the cost of a
        # second shuffle.
        chunk_ms = self._opt("ordered_chunk_ms")
        if not chunk_ms:
            return base.groupBy(*keys, "batch_id").agg(
                sg.agg_ordered(F.col(TIME_COL), F.col(va)).alias("delta"),
                F.max(TIME_COL).alias(TIME_COL),
            )
        chunk = F.floor(F.unix_millis(F.col(TIME_COL)) / F.lit(int(chunk_ms)))
        per_chunk = base.groupBy(*keys, "batch_id", chunk.alias("__chunk__")).agg(
            sg.agg_ordered(F.col(TIME_COL), F.col(va)).alias("__cv__"),
            F.max(TIME_COL).alias(TIME_COL),
        )
        return per_chunk.groupBy(*keys, "batch_id").agg(
            sg.agg_ordered(F.col("__chunk__"), F.col("__cv__")).alias("delta"),
            F.max(TIME_COL).alias(TIME_COL),
        )

    def _compile_summer(self, node: g.Summer) -> DataFrame:
        """Emit (key, batch_id, prev, delta): the reference summer's
        (Option[previous-total], delta) stream (Producer.scala:412-420),
        computed as a cumulative window over per-batch partials
        (BatchedStore.scala:157-244 groupedSum/partials equivalent).
        """
        self._validate_loop_sandwich(node)
        sg, batcher, base, va = self._summer_parts(node)
        shards = self._opt("shards")  # Reducers/FlatMapShards analog
        if shards:
            base = base.repartition(int(shards), *node.keys)
        commutative = self._opt("commutative")  # MonoidIsCommutative analog
        if commutative is not None:
            sg = _with_commutativity(sg, commutative)
        per_batch = self._per_batch_delta(sg, base, node.keys, va)

        w = (
            Window.partitionBy(*node.keys)
            .orderBy("batch_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        merge_fn = _WINDOW_MERGE_CARRIER.get(getattr(sg, "name", None))
        if merge_fn is not None:
            prev = merge_fn(F.col("delta"), w)
        else:
            # generic semigroup: fold the (few, bounded-by-batch-count)
            # prior per-batch aggregates in time order
            prior = F.collect_list(F.col("delta")).over(
                w  # window is already batch-ordered
            )
            prev = F.when(F.size(prior) == 0, F.lit(None)).otherwise(
                F.aggregate(
                    F.slice(prior, 2, F.greatest(F.size(prior) - 1, F.lit(0))),
                    F.element_at(prior, 1),
                    lambda acc, x: sg.merge(acc, x),
                )
            )
        out = per_batch.withColumn("prev", prev)

        init = self._initial_snapshot(node)
        if init is not None:
            out = out.join(
                F.broadcast(init.select(*node.keys, F.col("value").alias("__init__")))
                if init.isStreaming is False
                else init,
                on=node.keys,
                how="left",
            ).withColumn("prev", sg.merge_null_safe(F.col("__init__"), F.col("prev"))).drop(
                "__init__"
            )
        return out.select(*node.keys, "batch_id", TIME_COL, "prev", "delta")

    def _initial_snapshot(self, node: g.Summer) -> Optional[DataFrame]:
        store = node.store
        if store is None:
            return None
        snap = store.read_last(self.spark)
        return None if snap is None else snap[1]

    def _compile_snapshot(self, node: g.Summer) -> DataFrame:
        """Final store contents (one row per key) — aggregate raw events in
        one pass rather than folding per-batch deltas."""
        sg, batcher, base, va = self._summer_parts(node)
        if sg.commutative:
            agg = sg.agg(F.col(va))
        else:
            agg = sg.agg_ordered(F.col(TIME_COL), F.col(va))
        out = base.groupBy(*node.keys).agg(agg.alias("value"))
        init = self._initial_snapshot(node)
        if init is not None:
            out = (
                out.join(
                    init.select(*node.keys, F.col("value").alias("__init__")),
                    on=node.keys,
                    how="full",
                )
                .withColumn("value", sg.merge_null_safe(F.col("__init__"), F.col("value")))
                .drop("__init__")
            )
        return out


def plan(spark: SparkSession, node: g.Producer) -> BatchPlan:
    return BatchPlanner(spark).plan(node)


def to_dataframe(spark: SparkSession, node: g.Producer) -> DataFrame:
    """Plan and execute side-effect writes; return the tail DataFrame."""
    return plan(spark, node).run()
