"""Top-k per key — bounded-state implementation.

The reference's idiom is a top-k value monoid fed to sumByKey (SURVEY
§2.5): state is bounded by k at every merge. A naive Spark translation
(`slice(sort(collect_list(v)), 1, k)`) is NOT bounded: collect_list's
aggregation buffer holds every value of a key in its reducer, so one hot
key OOMs at 100 TB even though the final answer is k rows.

``topk_by_key`` restores the monoid's bound with two-phase salted
aggregation: shuffle on (key, salt) and trim each partial to k, then
merge the ≤ salt_buckets × k survivors per key. Reducer state is
O(k × buckets) regardless of key skew — the same trick the reference's
map-side AsyncSummer + sharded summers play (FinalFlatMap.scala:49-52).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _trim(arr: Column, k: int, descending: bool) -> Column:
    s = F.array_sort(arr)
    if descending:
        s = F.reverse(s)
    return F.slice(s, 1, k)


def topk_by_key(
    df: DataFrame,
    keys: Sequence[str] | str,
    value_col: str,
    k: int,
    descending: bool = True,
    salt_buckets: int = 64,
) -> DataFrame:
    """One row per key with ``topk`` = the k largest (or smallest) values.

    Salt is derived from the value itself (deterministic, no RNG state),
    spreading each key's values uniformly over ``salt_buckets`` partial
    groups.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(_trim(F.collect_list(value_col), k, descending).alias("__part__"))
    )
    return partial.groupBy(*keys).agg(
        _trim(F.flatten(F.collect_list("__part__")), k, descending).alias("topk")
    )


def topk_rows(
    df: DataFrame,
    keys: Sequence[str] | str,
    value_col: str,
    k: int,
    descending: bool = True,
    salt_buckets: int = 64,
) -> DataFrame:
    """Exploded form: (keys..., rn 1..k, value) — rank by value only, so
    ties produce a deterministic multiset (equal values, arbitrary order)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    arr = topk_by_key(df, keys, value_col, k, descending, salt_buckets)
    return arr.select(
        *keys, F.posexplode("topk").alias("pos", value_col)
    ).select(*keys, (F.col("pos") + 1).cast("long").alias("rn"), value_col)
