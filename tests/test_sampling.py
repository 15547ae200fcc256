"""Deterministic sampling properties — the contracts that make a sample
reproducible and auditable (functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summingbird_spark.functions.sampling import (
    hash_sample,
    mixture,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).selectExpr("id AS doc_id", "id % 7 AS grp")


def test_hash_sample_layout_independent(spark, ids):
    """The kept id set is identical regardless of physical layout —
    the property DataFrame.sample (per-partition seeds) lacks."""
    a = {r.doc_id for r in hash_sample(ids, 0.3, "doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(ids.repartition(17), 0.3, "doc_id").collect()
    }
    c = {
        r.doc_id for r in hash_sample(ids.coalesce(1), 0.3, "doc_id").collect()
    }
    assert a == b == c
    assert 0.2 < len(a) / 5000 < 0.4  # rate lands near 30%


def test_hash_sample_nested_rates_and_disjoint_seeds(spark, ids):
    s10 = {r.doc_id for r in hash_sample(ids, 0.1, "doc_id").collect()}
    s20 = {r.doc_id for r in hash_sample(ids, 0.2, "doc_id").collect()}
    assert s10 < s20  # same seed: smaller rate is a subset (ablation nesting)
    other = {r.doc_id for r in hash_sample(ids, 0.2, "doc_id", seed=9).collect()}
    # different seed: an independent draw, not the same set
    assert other != s20
    jacc = len(other & s20) / len(other | s20)
    assert jacc < 0.25  # ~independent 20% draws overlap ~11% of the union


def test_hash_sample_rejects_bad_fraction(spark, ids):
    with pytest.raises(ValueError):
        hash_sample(ids, 1.5, "doc_id")


def test_stratified_sample_exact_quota_and_stability(spark, ids):
    out = stratified_sample(ids, "grp", 10, "doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r.grp, set()).add(r.doc_id)
    assert all(len(v) == 10 for v in per.values())  # exact quota (5000/7 > 10)

    # group isolation: removing OTHER groups' rows never changes this
    # group's picks
    only3 = stratified_sample(
        ids.where("grp = 3"), "grp", 10, "doc_id"
    ).collect()
    assert {r.doc_id for r in only3} == per[3]

    # quota growth only ADDS rows (nested)
    bigger = stratified_sample(ids, "grp", 25, "doc_id")
    per25 = {}
    for r in bigger.collect():
        per25.setdefault(r.grp, set()).add(r.doc_id)
    assert all(per[g] < per25[g] for g in per)


def test_stratified_sample_small_group_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(3)],
        "doc_id long, grp string",
    )
    out = stratified_sample(df, "grp", 10, "doc_id").collect()
    got = {}
    for r in out:
        got.setdefault(r.grp, set()).add(r.doc_id)
    assert len(got["big"]) == 10 and len(got["small"]) == 3


def test_mixture_rates_and_provenance(spark):
    a = spark.range(0, 4000).selectExpr("id AS doc_id")
    b = spark.range(0, 4000).selectExpr("id AS doc_id")
    mixed = mixture([(a, 0.5), (b, 0.1)], "doc_id", source_col="src")
    counts = {r.src: r.n for r in mixed.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert 0.4 < counts[0] / 4000 < 0.6
    assert 0.05 < counts[1] / 4000 < 0.16
    # per-source seeds are independent: the same id can appear in both
    # sources' samples or neither — provenance disambiguates
    rerun = mixture([(a, 0.5), (b, 0.1)], "doc_id", source_col="src")
    assert sorted(map(tuple, mixed.collect())) == sorted(map(tuple, rerun.collect()))


def test_hash_sample_streaming_batch_parity(spark, tmp_path):
    """hash_sample is a stateless codegen filter, so it applies to a
    streaming DataFrame unchanged and keeps EXACTLY the batch-kept id set
    — deterministic sampling composes with either execution mode (the
    corpus-mixing story holds for streaming ingestion too)."""
    df = spark.range(0, 2000).selectExpr("id AS doc_id", "id % 5 AS grp")
    src_dir = str(tmp_path / "src")
    df.coalesce(2).write.parquet(src_dir)

    batch_kept = {
        r.doc_id
        for r in hash_sample(spark.read.parquet(src_dir), 0.25, "doc_id").collect()
    }

    stream = spark.readStream.schema("doc_id long, grp long").parquet(src_dir)
    q = (
        hash_sample(stream, 0.25, "doc_id")
        .writeStream.format("memory")
        .queryName("sample_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_kept = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM sample_stream").collect()
    }
    assert stream_kept == batch_kept
    assert 0.15 < len(batch_kept) / 2000 < 0.35


def test_weighted_sample_matches_python_replay(spark):
    import hashlib
    import math

    from summingbird_spark.functions.sampling import weighted_sample

    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")

    def ekey(i, w, seed=3):
        b = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16)
        return round(-math.log((b + 0.5) / 2**32) / w, 9)

    want = sorted(rows, key=lambda r: (ekey(*r), r[0]))[:25]
    got = weighted_sample(df, 25, "w", "id", seed=3).collect()
    assert sorted(r["id"] for r in got) == sorted(r[0] for r in want)


def test_weighted_sample_is_layout_independent_and_biased(spark):
    from summingbird_spark.functions.sampling import weighted_sample

    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sorted(r["id"] for r in weighted_sample(df, 200, "w", "id", seed=1).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(13), 200, "w", "id", seed=1).collect()
    )
    assert a == b
    heavy = sum(1 for i in a if i < 100)
    assert heavy >= 95  # weight-100 rows are ~100x more likely per unit


def test_weighted_sample_drops_nonpositive_weights(spark):
    from summingbird_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "id long, w double"
    )
    assert [r["id"] for r in weighted_sample(df, 10, "w", "id").collect()] == [4]


def test_temperature_mixture_flattens_sources(spark):
    from summingbird_spark.functions.sampling import temperature_mixture

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_mixture(df, "src", "id", alpha=0.5, target_rows=400.0)
    got = out.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in got}
    # alpha=0.5: p_big = 30/40, p_small = 10/40 -> expect ~300 / ~100;
    # proportional (alpha=1) would give 360 / 40 — small must be up-weighted
    assert 60 <= by.get("small", 0) <= 100  # rate = min(1, 100/100) = 1.0
    assert 250 <= by["big"] <= 350
    # determinism + layout independence
    a = sorted(r["id"] for r in out.collect())
    b = sorted(
        r["id"]
        for r in temperature_mixture(
            df.repartition(7), "src", "id", alpha=0.5, target_rows=400.0
        ).collect()
    )
    assert a == b


def test_temperature_mixture_alpha_one_is_proportional(spark):
    from summingbird_spark.functions.sampling import temperature_mixture

    rows = [(i, "a" if i % 2 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_mixture(df, "src", "id", alpha=1.0, target_rows=200.0)
    by = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # equal sources, alpha=1 -> each sampled at rate 0.5
    assert abs(by["a"] - 100) < 30 and abs(by["b"] - 100) < 30
