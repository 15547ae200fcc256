"""Deterministic sampling — the data-mixing workhorses of a training
corpus pipeline.

``df.sample()`` is seeded per-partition, so its output changes with the
input layout (file count, partition sizes) — unacceptable for a corpus
that must be reproducible run-to-run and auditable row-by-row. These
operators derive keep/drop from a CONTENT hash of the row id, so the
sample is a pure function of (ids, seed, rate): stable across layouts,
engines (portable md5 formulation, DuckDB-checkable), retries, and
cluster sizes — the same exactly-once-by-value idempotence argument the
engine's stores lean on.

Scale shape: both operators are pure Column expressions (whole-stage
codegen). ``hash_sample`` is a scan-side filter — no shuffle at all, and
it composes with partition pruning. ``stratified_sample`` shuffles once
on the group key for its per-group rank, the same single shuffle any
per-group top-k pays; group skew is ordinary window skew (AQE-split).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 8 hex chars of md5 → uniform 32-bit bucket, portable to any SQL engine
_BUCKET_SPACE = 16 ** 8


def _hash_bucket(id_col: Column, seed: int) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by md5(seed|id).

    Deterministic and layout-independent: the same (id, seed) is kept or
    dropped everywhere, so reruns, retries, different partitionings, and
    different engines agree row-for-row (unlike ``DataFrame.sample``,
    which reseeds per partition). Disjoint seeds give independent
    samples; ``fraction`` splits of the SAME seed are nested
    (rate 0.1 ⊂ rate 0.2), which is exactly what corpus ablation
    studies want.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]; got {fraction!r}")
    return df.where(
        _hash_bucket(F.col(id_col), seed) < int(fraction * _BUCKET_SPACE)
    )


def stratified_sample(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    n_per_group: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n, group size)`` rows per group, chosen by hash rank.

    The per-group quota sampler for balanced training mixes (cap each
    language/domain/source at N docs). Selection order is the md5 bucket
    (ties broken by id), so the quota is a deterministic function of the
    group's members — adding rows to OTHER groups never changes this
    group's picks, and growing ``n`` only ADDS rows (nested samples).
    One shuffle on the group key; no global sort.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_bucket(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("__rank__", F.row_number().over(w))
        .where(F.col("__rank__") <= n_per_group)
        .drop("__rank__")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str,
    seed: int = 0,
    ndigits: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``n`` rows, inclusion
    probability proportional to ``weight_col`` (algorithm A-ES,
    Efraimidis & Spirakis 2006 — rank rows by ``-ln(u)/w`` with u a
    per-row uniform, keep the n smallest).

    The uniform comes from the same portable md5 bucket as
    ``hash_sample`` (u = (bucket + 0.5) / 2^32 — never 0), so the sample
    is a pure function of (ids, weights, seed): reproducible across
    layouts, engines, and retries. The exponential key is rounded before
    ranking (ties -> id) so a last-ulp ``ln`` difference between engines
    cannot flip the selection boundary.

    Rows with weight <= 0 or NULL are excluded (zero mass). One-pass,
    no shuffle: the global top-n runs as TakeOrdered (per-partition
    heaps + driver merge of n·P candidates).
    """
    w = F.col(weight_col).cast("double")
    u = (_hash_bucket(F.col(id_col), seed) + 0.5) / F.lit(float(_BUCKET_SPACE))
    ekey = F.round(-F.log(u) / w, ndigits)
    return (
        df.where(w > 0)
        .orderBy(ekey.asc(), F.col(id_col).asc())
        .limit(n)
    )


def mixture(
    sources: Sequence[tuple[DataFrame, float]],
    id_col: str,
    seed: int = 0,
    source_col: Optional[str] = None,
) -> DataFrame:
    """Training-data mixture: union of ``(df, rate)`` pairs, each source
    hash-sampled at its rate (rates are independent per source — they
    need not sum to 1). ``source_col`` optionally tags provenance.
    Deterministic end-to-end, so a mixture recipe is reproducible from
    its (sources, rates, seed) alone.
    """
    if not sources:
        raise ValueError("mixture needs at least one (df, rate) source")
    parts = []
    for i, (df, rate) in enumerate(sources):
        # per-source seed offset: the same id sampled independently in
        # different sources
        part = hash_sample(df, rate, id_col, seed=seed * 1000003 + i)
        if source_col is not None:
            part = part.withColumn(source_col, F.lit(i))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_rows: Optional[float] = None,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-sampling
    rule of mBERT/XLM-R: p_s ∝ n_s^α): draw ~``target_rows`` rows with
    per-source inclusion rate  min(1, target · p_s / n_s), which
    up-weights small sources (α < 1 flattens the source distribution;
    α = 1 is proportional, α = 0 uniform-over-sources).

    One bounded aggregation (per-source counts — rows = #sources) feeds
    a LITERAL rate map compiled into the scan-side hash filter, so the
    sample itself is a zero-shuffle codegen filter, deterministic from
    (ids, counts, α, seed) like every sampler here.

    ``target_rows`` defaults to half the corpus.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df.where(F.lit(False))
    total = sum(counts.values())
    if target_rows is None:
        target_rows = 0.5 * total
    z = sum(n ** alpha for n in sorted(counts.values()))
    thresholds = []
    for s, n in counts.items():
        rate = min(1.0, target_rows * (n ** alpha) / z / n)
        thresholds.append((s, int(rate * _BUCKET_SPACE)))
    mapping = F.create_map(
        *[F.lit(x) for s, t in thresholds for x in (s, t)]
    )
    return df.where(
        _hash_bucket(F.col(id_col), seed) < mapping[F.col(source_col)]
    )
