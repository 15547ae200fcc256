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


def _row_salt(salt_buckets: int, salt_col: str | None):
    """Per-ROW uniform salt. Hashing the value itself would send every
    duplicate of a hot value to one bucket — rebuilding exactly the
    unbounded single-group buffer salting exists to prevent (counts and
    scores repeat heavily). ``monotonically_increasing_id`` is
    partition_id<<33 | row_number, so mod a power-of-two bucket count it
    cycles uniformly within every partition; top-k/commutative merges are
    grouping-invariant, so nondeterministic assignment is safe."""
    if salt_col is not None:
        return F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
    return F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))


def topk_by_key(
    df: DataFrame,
    keys: Sequence[str] | str,
    value_col: str,
    k: int,
    descending: bool = True,
    salt_buckets: int = 64,
    salt_col: str | None = None,
) -> DataFrame:
    """One row per key with ``topk`` = the k largest (or smallest) values.

    Pass ``salt_col`` naming a unique-ish id column for a deterministic
    salt; default derives from row position (uniform, not value-skewed).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salt = _row_salt(salt_buckets, salt_col)
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
    salt_col: str | None = None,
) -> DataFrame:
    """Exploded form: (keys..., rn 1..k, value) — rank by value only, so
    ties produce a deterministic multiset (equal values, arbitrary order)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    arr = topk_by_key(df, keys, value_col, k, descending, salt_buckets, salt_col)
    return arr.select(
        *keys, F.posexplode("topk").alias("pos", value_col)
    ).select(*keys, (F.col("pos") + 1).cast("long").alias("rn"), value_col)
