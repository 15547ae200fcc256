"""Per-name options — the reference's Options/Name scoping system.

Reference: jobs attach ``.name("segment")`` markers to the DAG
(Producer.scala:228); platform options are looked up per name with
closest-marker-wins semantics via ``Options.getFirst``
(summingbird-core/.../Options.scala:27-60); Storm strips the markers while
keeping a producer→names map (online/planner/StripNamedNodes.scala:26-96).

Spark mapping of the reference's option vocabulary:

| reference option                | here                                   |
|---------------------------------|----------------------------------------|
| Reducers / FlatMapShards        | ``shuffle_partitions`` / ``shards``    |
| MonoidIsCommutative             | ``commutative`` (overrides semigroup)  |
| CacheSize / FlushFrequency      | n/a (Catalyst partial agg / trigger)   |
| source/flatMap/summer parallelism | ``shards`` hint at the named node    |
| SummerParallelism (online)      | ``summer_key_buckets`` (streaming state shard count; None = per-key; "auto" = plan-time cardinality probe, StreamPlanner docstring) |

Unknown keys are preserved (callers may define their own); the planner
consults ``shards`` (repartition after the named node), ``broadcast``
(join hint), and ``commutative`` (summer path selection).
"""

from __future__ import annotations

from typing import Any, Optional


class Options:
    """name → {option: value}, resolved innermost-name-first."""

    def __init__(self, per_name: Optional[dict[str, dict[str, Any]]] = None):
        self.per_name = dict(per_name or {})

    def set(self, name: str, **opts: Any) -> "Options":
        self.per_name.setdefault(name, {}).update(opts)
        return self

    def get_first(self, names: list[str], key: str, default: Any = None) -> Any:
        """Options.getFirst (Options.scala:27-60): innermost (closest to the
        node) name that defines ``key`` wins; ``names`` is ordered
        innermost-first."""
        for n in names:
            if n in self.per_name and key in self.per_name[n]:
                return self.per_name[n][key]
        return default
