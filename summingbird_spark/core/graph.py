"""The logical dataflow DAG — summingbird's Producer algebra, column-first.

Node-per-operator mirror of the reference's single-file algebra
(reference: summingbird-core/src/main/scala/com/twitter/summingbird/Producer.scala:134-440),
with the idiomatic inversion called out in SURVEY §1.5: where the reference
takes opaque ``T => TraversableOnce[U]`` lambdas, every operator here takes
Spark **Column expressions** (strings or Columns), so Catalyst sees the whole
plan and predicate pushdown / column pruning / fusion are free. Arbitrary
Python logic drops to ``transform``/``map_in_pandas`` (Arrow-batched), never
row-at-a-time UDFs.

Conventions:
* every compiled DataFrame carries an event-time column ``__time__``
  (TimestampType) — the TimeExtractor analog
  (summingbird-core/.../TimeExtractor.scala:24-38);
* nodes are immutable; the DAG is planned by ``batch.planner`` /
  ``streaming.planner`` with per-node memoization so diamonds compile once
  (Producer.scala:146-219 memoized structural equality → we memoize by id).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME_COL = "__time__"

ColumnLike = Union[str, Column]


def as_col(c: ColumnLike) -> Column:
    return F.expr(c) if isinstance(c, str) else c


class Producer:
    """A node emitting timestamped rows. Fluent API builds child nodes."""

    def __init__(self, *parents: "Producer"):
        self.parents = tuple(parents)

    # ---- the §2.1 logical algebra -------------------------------------
    def map(self, **cols: ColumnLike) -> "Producer":
        """Add/replace columns (reference map, Producer.scala:256-258)."""
        return MapCols(self, cols)

    def select(self, *keep: str, **named: ColumnLike) -> "Producer":
        """Projection; event time is always retained."""
        return Select(self, keep, named)

    def filter(self, predicate: ColumnLike) -> "Producer":
        """Producer.scala:242-244."""
        return Filter(self, predicate)

    def option_map(self, predicate: ColumnLike, **cols: ColumnLike) -> "Producer":
        """Fused filter+map — the reference normalizes map/filter/collect
        into this single node kind (Producer.scala:242-258)."""
        return Select(Filter(self, predicate), (), cols) if cols else Filter(self, predicate)

    collect = option_map  # PartialFunction == predicate + projection

    def flat_map(self, expr: ColumnLike, alias: str = "value", keep: Sequence[str] = ()) -> "Producer":
        """Explode an array expression to rows (Producer.scala:270-271).

        Reference flatMap replaces the payload; we keep ``keep`` columns
        (plus event time) alongside each exploded element.
        """
        return FlatMap(self, expr, alias, tuple(keep))

    def transform(self, fn: Callable[..., "DataFrame"], schema: Optional[str] = None) -> "Producer":
        """Escape hatch: arbitrary DataFrame→DataFrame transform (must
        preserve __time__). For per-row Python logic prefer map_in_pandas."""
        return Transform(self, fn)

    def map_in_pandas(self, fn, schema: str) -> "Producer":
        """Arrow-batched Python flatMap (mapInPandas); schema must include
        __time__ timestamp."""
        return MapInPandas(self, fn, schema)

    def merge(self, other: "Producer") -> "Producer":
        """Bag-union, no dedup (Producer.scala:222-231)."""
        return Merged(self, other)

    __add__ = merge

    def either(self, other: "Producer") -> "Producer":
        """Tagged union (Producer.scala:280-282): adds __side__ 'L'/'R'."""
        return Merged(
            MapCols(self, {"__side__": F.lit("L")}),
            MapCols(other, {"__side__": F.lit("R")}),
        )

    def name(self, n: str) -> "Producer":
        """Metadata marker for option scoping (Producer.scala:228).

        As in the reference, the name labels the producer chain ENDING at
        the marker: attach it AFTER the operator you want to configure
        (``...sum_by_key(...).name("agg")``), then pass
        ``Options().set("agg", shards=..., broadcast=..., commutative=...)``
        to the planner. Innermost marker wins (Options.scala:27-60).
        """
        return Named(self, n)

    def write(self, sink) -> "Producer":
        """Side-effect write; pass-through continues the stream
        (Producer.scala:277, WrittenProducer)."""
        return Written(self, sink)

    def also(self, other: "Producer") -> "Producer":
        """Plan self for its effects, emit other (Producer.scala:297-311)."""
        return Also(self, other)

    def left_join(self, service, on: Sequence[str] | str, broadcast: Optional[bool] = None) -> "Producer":
        """Key-equi LEFT join against a Service (dimension) —
        Producer.scala:388-389; physical variants live in operators.asof."""
        on = [on] if isinstance(on, str) else list(on)
        return LeftJoin(self, service, on, broadcast)

    def lookup(self, service, on: Sequence[str] | str, broadcast: Optional[bool] = None) -> "Producer":
        """Sugar over left_join (Producer.scala:252-253)."""
        return self.left_join(service, on, broadcast)

    def key_by(self, *key_cols: str) -> "Keyed":
        """Enter the KeyedProducer surface (Producer.scala:60-68): any
        producer is keyed by naming its key columns."""
        return Keyed(self, key_cols)

    def sum_by_key(
        self,
        keys: Sequence[str] | str,
        value: ColumnLike,
        semigroup="sum",
        store=None,
        batcher=None,
        value_alias: str = "value",
    ) -> "Summer":
        """THE aggregation primitive (Producer.scala:331-334, 421-422).

        Emits one row per (key, batch) with ``prev`` (merged total of all
        earlier batches ⊕ initial store, NULL if none — the Option[V]) and
        ``delta`` (this batch's partial sum): the reference's
        (previous-total, delta) stream, where a delta is already a partial
        sum of the batch's events (Producer.scala:412-420).
        """
        keys = [keys] if isinstance(keys, str) else list(keys)
        return Summer(self, keys, value, semigroup, store, batcher, value_alias)

    def repartition(self, num: Optional[int] = None, *cols: str) -> "Producer":
        """Shard hint (reference FlatMapShards / Reducers options)."""
        return Repartition(self, num, cols)

    def observe(self, name: str, **metrics: ColumnLike) -> "Producer":
        """Job counters/statistics — the reference's Stats API
        (jobWithStats, core-test TestGraphs.scala:494; counters are
        incremented inside user lambdas there). Spark-first inversion:
        counters are declarative aggregate expressions over the rows
        passing this point (``df.observe``), collected per action /
        micro-batch with no shuffle. Read them from
        ``BatchPlan.observations[name]`` after running."""
        return Observed(self, name, metrics)


class Keyed:
    """KeyedProducer view: key columns are named, value = the rest.

    Mirrors Producer.scala:342-439's keyed sugar; every method compiles to
    plain column ops on the underlying Producer (no shuffle unless noted).
    """

    def __init__(self, producer: Producer, key_cols: Sequence[str]):
        self.producer = producer
        self.key_cols = tuple(key_cols)

    def _wrap(self, p: Producer) -> "Keyed":
        return Keyed(p, self.key_cols)

    def filter_keys(self, predicate: ColumnLike) -> "Keyed":
        return self._wrap(self.producer.filter(predicate))

    def filter_values(self, predicate: ColumnLike) -> "Keyed":
        return self._wrap(self.producer.filter(predicate))

    def map_keys(self, **new_keys: ColumnLike) -> "Keyed":
        """select(f(key), value) — Producer.scala:405-406. Changes the key
        column set to the new names."""
        p = MapCols(self.producer, new_keys, drop=tuple(k for k in self.key_cols if k not in new_keys))
        return Keyed(p, tuple(new_keys))

    def flat_map_keys(self, expr: ColumnLike, alias: str) -> "Keyed":
        """explode(f(key)) keeping values (Producer.scala:374-375) — the
        rollup idiom (SURVEY §2.5): each key explodes to its rollup keys."""
        p = ExplodeKeep(self.producer, expr, alias, drop=self.key_cols)
        return Keyed(p, (alias,))

    def map_values(self, **cols: ColumnLike) -> "Keyed":
        return self._wrap(MapCols(self.producer, cols))

    def flat_map_values(self, expr: ColumnLike, alias: str) -> "Keyed":
        p = ExplodeKeep(self.producer, expr, alias, drop=())
        return Keyed(p, self.key_cols)

    def collect_keys(self, predicate: ColumnLike, **new_keys: ColumnLike) -> "Keyed":
        """Partial function on the KEY side (Producer.scala:352-369):
        filter, then re-map the key columns — values ride along (unlike
        ``Producer.collect``, which projects the whole row)."""
        p = Filter(self.producer, predicate)
        if not new_keys:
            return Keyed(p, self.key_cols)
        p = MapCols(
            p, new_keys, drop=tuple(k for k in self.key_cols if k not in new_keys)
        )
        return Keyed(p, tuple(new_keys))

    def collect_values(self, predicate: ColumnLike, **cols: ColumnLike) -> "Keyed":
        """Partial function on the VALUE side: filter, then add/replace
        value columns — keys and other columns ride along."""
        p = Filter(self.producer, predicate)
        return self._wrap(MapCols(p, cols) if cols else p)

    def keys(self) -> Producer:
        return Select(self.producer, self.key_cols, {})

    def values(self, *value_cols: str) -> Producer:
        return Select(self.producer, value_cols, {})

    def swap(self, *new_key_cols: str) -> "Keyed":
        return Keyed(self.producer, new_key_cols)

    def left_join(self, service, broadcast: Optional[bool] = None) -> "Keyed":
        return self._wrap(self.producer.left_join(service, list(self.key_cols), broadcast))

    def sum_by_key(self, value: ColumnLike, semigroup="sum", store=None, batcher=None, value_alias="value") -> "Summer":
        return self.producer.sum_by_key(list(self.key_cols), value, semigroup, store, batcher, value_alias)


# ---- node types -------------------------------------------------------


class Source(Producer):
    """Timestamped source (Producer.scala:54). ``loader`` is
    (spark) -> DataFrame; ``time_col`` names the event-time column."""

    def __init__(self, loader, time_col: Optional[str] = None, name: str = "source"):
        super().__init__()
        self.loader = loader
        self.time_col = time_col
        self.source_name = name


class MapCols(Producer):
    def __init__(self, parent: Producer, cols: dict, drop: Sequence[str] = ()):
        super().__init__(parent)
        self.cols = {k: as_col(v) for k, v in cols.items()}
        self.drop = tuple(drop)


class Select(Producer):
    def __init__(self, parent: Producer, keep: Sequence[str], named: dict):
        super().__init__(parent)
        self.keep = tuple(keep)
        self.named = {k: as_col(v) for k, v in named.items()}


class Filter(Producer):
    def __init__(self, parent: Producer, predicate: ColumnLike):
        super().__init__(parent)
        self.predicate = as_col(predicate)


class FlatMap(Producer):
    def __init__(self, parent: Producer, expr: ColumnLike, alias: str, keep: tuple):
        super().__init__(parent)
        self.expr = as_col(expr)
        self.alias = alias
        self.keep = keep


class ExplodeKeep(Producer):
    """Explode one expression, keep all other columns (minus ``drop``)."""

    def __init__(self, parent: Producer, expr: ColumnLike, alias: str, drop: tuple):
        super().__init__(parent)
        self.expr = as_col(expr)
        self.alias = alias
        self.drop = drop


class Transform(Producer):
    def __init__(self, parent: Producer, fn):
        super().__init__(parent)
        self.fn = fn


class MapInPandas(Producer):
    def __init__(self, parent: Producer, fn, schema: str):
        super().__init__(parent)
        self.fn = fn
        self.schema = schema


class Merged(Producer):
    def __init__(self, left: Producer, right: Producer):
        super().__init__(left, right)


class Named(Producer):
    def __init__(self, parent: Producer, n: str):
        super().__init__(parent)
        self.node_name = n


class Written(Producer):
    def __init__(self, parent: Producer, sink):
        super().__init__(parent)
        self.sink = sink


class Also(Producer):
    """parents = (effects_branch, result_branch)."""

    def __init__(self, effects: Producer, result: Producer):
        super().__init__(effects, result)


class LeftJoin(Producer):
    def __init__(self, parent: Producer, service, on: list, broadcast: Optional[bool]):
        super().__init__(parent)
        self.service = service
        self.on = on
        self.broadcast = broadcast


class Observed(Producer):
    def __init__(self, parent: Producer, obs_name: str, metrics: dict):
        super().__init__(parent)
        self.obs_name = obs_name
        self.metrics = {k: as_col(v) for k, v in metrics.items()}


class Repartition(Producer):
    def __init__(self, parent: Producer, num: Optional[int], cols: tuple):
        super().__init__(parent)
        self.num = num
        self.cols = cols


class Summer(Producer):
    """sumByKey (Producer.scala:331-334). Output columns:
    key cols, ``batch_id``, ``prev`` (nullable), ``delta``.
    """

    def __init__(self, parent, keys, value, semigroup, store, batcher, value_alias):
        super().__init__(parent)
        self.keys = keys
        self.value = as_col(value)
        self.semigroup = semigroup
        self.store = store
        self.batcher = batcher
        self.value_alias = value_alias

    def updates(self) -> Producer:
        """The merged running totals per (key, batch): prev ⊕ delta."""
        return SummerUpdates(self)

    def snapshot(self) -> Producer:
        """Final store contents: one row per key, total over all batches."""
        return SummerSnapshot(self)


class SummerUpdates(Producer):
    def __init__(self, summer: Summer):
        super().__init__(summer)
        self.summer = summer


class SummerSnapshot(Producer):
    def __init__(self, summer: Summer):
        super().__init__(summer)
        self.summer = summer


def source(loader, time_col: Optional[str] = None, name: str = "source") -> Source:
    """Producer.source — ``loader`` is a (spark) -> DataFrame callable, a
    DataFrame, or a parquet path string."""
    if isinstance(loader, str):
        path = loader
        return Source(lambda spark: spark.read.parquet(path), time_col, name)
    if isinstance(loader, DataFrame):
        df = loader
        return Source(lambda spark: df, time_col, name)
    return Source(loader, time_col, name)


# ---- structural equality (the dagon analog) -------------------------------

# expression markers that must NEVER merge across distinct node instances:
# each instance draws independently, so value-equal text is not value-equal
# semantics (dagon's irreducibles analog)
_NONDETERMINISTIC = (
    "rand(", "randn(", "uuid()", "monotonically_increasing_id()", "shuffle(",
)


def _canon(v):
    """Canonical, hashable stand-in for a node attribute. Columns compare
    by their expression string (two independently-built `F.col('x') + 1`
    canonicalize equal); opaque objects (lambdas, services, stores,
    sinks, semigroup instances) fall back to identity — conservative:
    they merge only when they ARE the same object."""
    if isinstance(v, Column):
        s = str(v)
        if any(t in s for t in _NONDETERMINISTIC):
            return ("colid", id(v))
        return ("col", s)
    if isinstance(v, (str, int, float, bool, type(None))):
        return v
    if isinstance(v, (tuple, list)):
        return ("seq", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((str(k), _canon(x)) for k, x in v.items())))
    return ("obj", id(v))


def structural_key(node: "Producer", _memo: Optional[dict] = None):
    """Recursive value-equality key for a Producer subtree — the dagon
    structural-hashing analog (reference DagOptimizer works on a Literal
    graph where value-equal subtrees are ONE node). Planners key their
    compile memo and fan-out counts on this, so a diamond built from two
    value-equal (but not identical) chains compiles once and, under
    ``cache_fanout``, caches once — `DiamondToFlatMap`'s effect without
    the rewrite (DagOptimizer.scala:263-269)."""
    if _memo is None:
        _memo = {}
    k = id(node)
    if k in _memo:
        return _memo[k][1]
    attrs = tuple(
        sorted(
            (
                a,
                structural_key(v, _memo) if isinstance(v, Producer) else _canon(v),
            )
            for a, v in vars(node).items()
            if a != "parents" and not a.startswith("_")
        )
    )
    key = (
        type(node).__name__,
        attrs,
        tuple(structural_key(p, _memo) for p in node.parents),
    )
    # store the NODE alongside the key: the memo is keyed by id(node), and
    # planners keep one memo across plan() calls — without a strong
    # reference, a GC'd graph frees its ids for reuse and a later plan()
    # could silently read a stale key (and hence a stale compiled
    # DataFrame) for a brand-new node. Pinning the node also pins its
    # opaque attrs (lambdas, services), keeping _canon's ('obj', id(v))
    # fallback sound.
    _memo[k] = (node, key)
    return key
