"""Skew hardening for the LSH dedup candidate join — the 100 TB reality
check the operator docstrings promise.

Two distinct hazards, two distinct defenses:

* a MODERATELY hot (band, bkey) shuffle partition → AQE's skew join
  splits it at runtime (plan-asserted below);
* a PATHOLOGICAL mega-bucket (boilerplate corpus) → the m(m-1)/2 pair
  blowup is quadratic no matter how the partition is split, so
  ``max_bucket_size`` degrades those buckets to linear star edges while
  preserving cluster connectivity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summingbird_spark.functions.dedup import minhash_candidates

BOILER = "subscribe to our newsletter terms and conditions apply all rights reserved " * 3


def _corpus(spark, n_boiler=200, n_unique=60):
    rows = [(i, BOILER) for i in range(n_boiler)]
    # distinct tails so unique docs land in their own buckets
    rows += [
        (n_boiler + i, f"document number {i} about topic {i * 37} with words {i * i} unique")
        for i in range(n_unique)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_star_candidates_bounded(spark):
    """An adversarial boilerplate corpus (one mega-bucket per band) must
    not emit quadratic candidates under max_bucket_size: the hot buckets
    degrade to star edges (linear), every boilerplate doc stays connected
    to the cluster representative, and normal small-bucket pairs are
    untouched."""
    n_boiler = 200
    docs = _corpus(spark, n_boiler=n_boiler)
    bands = 4

    capped = minhash_candidates(
        docs, "doc_id", "text", num_perm=8, bands=bands, shingle_n=3,
        max_bucket_size=20,
    ).collect()
    all_pairs = n_boiler * (n_boiler - 1) // 2  # 19900 uncapped
    assert len(capped) < all_pairs / 10
    # star edges: every boilerplate doc is adjacent to the min-id rep, so
    # the dup cluster is one connected component through doc 0
    boiler_edges = {(r.id_a, r.id_b) for r in capped if r.id_a < n_boiler}
    assert {(0, i) for i in range(1, n_boiler)} <= boiler_edges

    # without the cap the same corpus is exact all-pairs (semantics default)
    uncapped = minhash_candidates(
        docs, "doc_id", "text", num_perm=8, bands=bands, shingle_n=3,
    )
    assert uncapped.where(F.col("id_a") < n_boiler).count() == all_pairs


@pytest.mark.parametrize("max_bucket_size,expect_star", [(5, True), (10**6, False)])
def test_capped_candidates_preserve_small_buckets(spark, max_bucket_size, expect_star):
    """Pairs from buckets at or below the threshold are identical with and
    without the cap — the guard only rewrites mega-buckets."""
    docs = _corpus(spark, n_boiler=30, n_unique=40)
    base = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(
            docs, "doc_id", "text", num_perm=8, bands=4, shingle_n=3
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(
            docs, "doc_id", "text", num_perm=8, bands=4, shingle_n=3,
            max_bucket_size=max_bucket_size,
        ).collect()
    }
    if expect_star:
        assert capped < base  # strictly fewer pairs ...
        assert {(0, i) for i in range(1, 30)} <= capped  # ... but connected
        # non-boilerplate pairs (small buckets) identical
        assert {p for p in base if p[0] >= 30} == {p for p in capped if p[0] >= 30}
    else:
        assert capped == base  # threshold above every bucket: no change


def test_candidate_join_aqe_skew_split(spark):
    """The in-bucket self-join on a skewed corpus must be split by AQE's
    skew-join handling (OptimizeSkewedJoin), not processed as one giant
    sort-merge partition: the executed plan carries a skew-split shuffle
    read. Thresholds are scaled down to test-data sizes; at production
    sizes the defaults fire the same rule."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4096",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2048",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        docs = _corpus(spark, n_boiler=400, n_unique=100)
        pairs = minhash_candidates(
            docs, "doc_id", "text", num_perm=8, bands=4, shingle_n=3
        )
        # execute THIS DataFrame's QueryExecution (count() would build a
        # new one and leave this plan un-finalized) so AQE replans it
        n = len(pairs.collect())
        assert n >= 400 * 399 // 2
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---- dup_clusters: the grouping stage downstream of the candidates --------

def test_dup_clusters_chain_and_components(spark):
    from summingbird_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame(
        # a 5-chain (worst diameter), a triangle, and an untouched singleton 99
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    ids = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 10, 11, 12, 99]], "doc_id long")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs, ids=ids).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 12: 10, 99: 99}


def test_dup_clusters_property_vs_union_find(spark):
    """Min-label propagation vs a driver-side union-find on random graphs."""
    import random

    rng = random.Random(7)
    n = 60
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(70)})
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(n)}

    from summingbird_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs, ids=ids).collect()}
    assert got == want


def test_star_capped_candidates_yield_same_clusters(spark):
    """The max_bucket_size star degradation's headline claim, verified:
    clusters from capped candidates == clusters from exact all-pairs."""
    from summingbird_spark.functions.dedup import dup_clusters, minhash_candidates

    docs = _corpus(spark, n_boiler=120, n_unique=50)
    ids = docs.select("doc_id")

    def clusters(**kw):
        pairs = minhash_candidates(
            docs, "doc_id", "text", num_perm=8, bands=4, shingle_n=3, **kw
        )
        return {
            r.id: r.cluster_id for r in dup_clusters(pairs, ids=ids).collect()
        }

    assert clusters(max_bucket_size=15) == clusters()


def test_keep_survivors_best_per_cluster(spark):
    from summingbird_spark.functions.dedup import keep_survivors

    docs = spark.createDataFrame(
        [(0, 0.5), (1, 0.9), (2, 0.9), (10, 0.1), (99, 0.7)],
        "doc_id long, quality double",
    )
    clusters = spark.createDataFrame(
        # {0,1,2} one cluster, {10} and {99} singletons
        [(0, 0), (1, 0), (2, 0), (10, 10), (99, 99)], "id long, cluster_id long"
    )
    got = {
        (r.cluster_id, r.doc_id)
        for r in keep_survivors(docs, clusters, "doc_id", score_col="quality").collect()
    }
    # cluster 0: quality tie 1 vs 2 -> min id wins; singletons survive
    assert got == {(0, 1), (10, 10), (99, 99)}

    # no score: min id per cluster
    got2 = {
        (r.cluster_id, r.doc_id)
        for r in keep_survivors(docs, clusters, "doc_id").collect()
    }
    assert got2 == {(0, 0), (10, 10), (99, 99)}


def test_dup_clusters_star_matches_propagate(spark):
    """method='star' (alternating large-star/small-star) must produce the
    identical clustering as min-label propagation on random graphs, and
    must converge on a long path WITHIN its O(log² n) round budget where
    propagation would need diameter rounds."""
    import random

    from summingbird_spark.functions.dedup import dup_clusters

    rng = random.Random(13)
    n = 60
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(65)})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    a = {r.id: r.cluster_id for r in dup_clusters(pairs, ids=ids).collect()}
    b = {
        r.id: r.cluster_id
        for r in dup_clusters(pairs, ids=ids, method="star").collect()
    }
    assert a == b

    # 200-node path: diameter 199. Propagation at max_iter=15 CANNOT have
    # converged; star must fully converge within the same budget.
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    got = {
        r.id: r.cluster_id
        for r in dup_clusters(path, method="star", max_iter=15).collect()
    }
    assert got == {i: 0 for i in range(200)}

    # self-pair-only nodes label themselves in both methods
    selfp = spark.createDataFrame([(5, 5), (7, 8)], "id_a long, id_b long")
    s = {r.id: r.cluster_id for r in dup_clusters(selfp, method="star").collect()}
    assert s == {5: 5, 7: 7, 8: 7}


# ---------------------------------------------------------- semantic dedup


def _semdedup_reference(rows, threshold):
    """Single-cluster numpy SemDeDup: keep a row iff no EARLIER row has
    cosine >= threshold."""
    import numpy as np

    ids = sorted(r[0] for r in rows)
    vecs = {r[0]: np.asarray(r[1], dtype=float) for r in rows}
    keep = {}
    for i, a in enumerate(ids):
        va = vecs[a] / np.linalg.norm(vecs[a])
        keep[a] = not any(
            float(va @ (vecs[b] / np.linalg.norm(vecs[b]))) >= threshold
            for b in ids[:i]
        )
    return keep


def test_semantic_dedup_matches_reference_single_cluster(spark):
    """With a pinned single-cluster assignment, decisions equal the
    brute-force reference, first doc survives, witnesses verify, and the
    blocked scan is block-size independent."""
    import math
    import random

    import numpy as np

    from summingbird_spark.functions.dedup import semantic_dedup

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base]))
        if i % 4 == 0:  # plant a near-duplicate of an earlier doc
            dup = [x + rng.gauss(0, 0.01) for x in base]
            rows.append((100 + i, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = df.selectExpr("vec_id", "CAST(0 AS INT) AS centroid_id")
    # float32 storage: recompute the reference from the stored values
    stored = [(r.vec_id, list(r.embedding)) for r in df.collect()]
    ref = _semdedup_reference(stored, 0.9)

    for block in (3, 1024):
        out = {
            r.vec_id: r
            for r in semantic_dedup(
                df, 0.9, k_clusters=1, assigned=assigned, block_rows=block
            ).collect()
        }
        assert {k: v.is_survivor for k, v in out.items()} == ref
        vecs = dict(stored)
        for r in out.values():
            if r.nearest_prior_id is None:
                continue
            assert r.nearest_prior_id < r.vec_id
            a = np.asarray(vecs[r.vec_id]); b = np.asarray(vecs[r.nearest_prior_id])
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert math.isclose(cos, r.nearest_prior_sim, abs_tol=1e-9)
            if not r.is_survivor:
                assert cos >= 0.9
    assert sum(not v for v in ref.values()) >= 8  # planted dups dropped


def test_semantic_dedup_is_cluster_scoped_and_null_safe(spark):
    """A near-dup pair split across clusters is NOT dropped (the
    SemDeDup trade); NULL vectors pass through as survivors."""
    from summingbird_spark.functions.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.001], 1),  # dups, different clusters
        (3, [0.0, 1.0], 0), (4, [0.001, 1.0], 0),  # dups, same cluster
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows] + [(9, None)],
        "vec_id long, embedding array<float>",
    )
    assigned = spark.createDataFrame(
        [(i, c) for i, v, c in rows], "vec_id long, centroid_id int"
    )
    out = {r.vec_id: r for r in semantic_dedup(
        df, 0.99, k_clusters=2, assigned=assigned).collect()}
    assert out[2].is_survivor          # cross-cluster dup survives
    assert not out[4].is_survivor      # same-cluster dup dropped
    assert out[4].nearest_prior_id == 3
    assert out[9].is_survivor and out[9].centroid_id is None
    assert len(out) == 5               # every input row classified once


def test_semantic_dedup_validates_threshold(spark):
    import pytest

    from summingbird_spark.functions.dedup import semantic_dedup

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        semantic_dedup(df, 0.0, k_clusters=1)


def test_semantic_dedup_string_ids(spark):
    """ids follow the input type: string ids (digests) order
    lexicographically and the witness columns come back as strings."""
    from summingbird_spark.functions.dedup import semantic_dedup

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.001]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    assigned = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "vec_id string, centroid_id int"
    )
    out = {r.vec_id: r for r in semantic_dedup(
        df, 0.99, k_clusters=1, assigned=assigned).collect()}
    assert out["a"].is_survivor and not out["b"].is_survivor
    assert out["b"].nearest_prior_id == "a"
    assert out["c"].is_survivor


def test_semantic_dedup_mega_cluster_guard(spark):
    """max_cluster_size subdivides a pathological cluster: every row is
    still classified exactly once, drops are a subset of the exact run's
    (the documented trade — only cross-sub-division dups go undetected),
    and near-identical boilerplate still mostly collapses."""
    import random

    from summingbird_spark.functions.dedup import semantic_dedup

    rng = random.Random(3)
    base = [rng.gauss(0, 1) for _ in range(8)]
    rows = [
        (i, [float(x + rng.gauss(0, 0.001)) for x in base]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = df.selectExpr("vec_id", "CAST(0 AS INT) AS centroid_id")

    exact = {r.vec_id: r.is_survivor for r in semantic_dedup(
        df, 0.95, k_clusters=1, assigned=assigned).collect()}
    guarded = {r.vec_id: r.is_survivor for r in semantic_dedup(
        df, 0.95, k_clusters=1, assigned=assigned,
        max_cluster_size=10).collect()}

    assert set(guarded) == set(exact) == set(range(40))
    assert sum(not s for s in exact.values()) == 39  # all dup one survivor
    # guarded: one survivor PER SUB-DIVISION (4 subs of ~10) — the trade
    n_kept = sum(s for s in guarded.values())
    assert 1 <= n_kept <= 8 and sum(not s for s in guarded.values()) >= 32
    # drops are a subset: the guard never drops a doc the exact run kept
    assert all(exact[k] is False for k, s in guarded.items() if s is False)


def test_semantic_dedup_stale_assignment_refuses(spark):
    """A corpus row absent from a caller-supplied ``assigned`` table must
    never vanish silently (VERDICT r15 item 1): the default
    on_unassigned='error' raises IN-PLAN naming the row; 'keep' routes it
    through like a NULL vector (survivor, NULL centroid, NULL witness);
    an unknown knob value raises eagerly. The happy path (artifact covers
    the corpus) is unchanged under both modes."""
    import pytest

    from summingbird_spark.functions.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    stale = spark.createDataFrame(  # row 3 arrived after the artifact
        [(1, 0), (2, 0)], "vec_id long, centroid_id int"
    )
    with pytest.raises(Exception, match="corpus row 3 is absent"):
        semantic_dedup(df, 0.99, k_clusters=1, assigned=stale).collect()

    out = {r.vec_id: r for r in semantic_dedup(
        df, 0.99, k_clusters=1, assigned=stale, on_unassigned="keep"
    ).collect()}
    assert set(out) == {1, 2, 3}           # one row per input row
    assert out[1].is_survivor and not out[2].is_survivor
    assert out[3].is_survivor and out[3].centroid_id is None
    assert out[3].nearest_prior_id is None and out[3].nearest_prior_sim is None

    with pytest.raises(ValueError, match="on_unassigned"):
        semantic_dedup(df, 0.99, k_clusters=1, assigned=stale,
                       on_unassigned="ignore")

    # a covering artifact is unaffected by the default refusal mode
    full = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "vec_id long, centroid_id int"
    )
    ok = {r.vec_id: r.is_survivor for r in semantic_dedup(
        df, 0.99, k_clusters=1, assigned=full).collect()}
    assert ok == {1: True, 2: False, 3: True}


def test_ivf_assign_hierarchical_contract(spark):
    """Two-level assignment: every row lands on exactly one REAL centroid,
    deterministically; on well-separated clusters it agrees with flat
    assignment for the overwhelming majority of rows (boundary rows may
    route differently — the documented IVF trade); small k falls back to
    the flat path exactly."""
    import numpy as np

    from summingbird_spark.functions.similarity import (
        ivf_assign,
        ivf_assign_hierarchical,
        kmeans_train,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((100, 12)) * 4  # k=100 > 64: two-level
    rows = []
    for i in range(3000):
        c = i % 100
        rows.append((i, [float(x) for x in centers[c] + rng.standard_normal(12) * 0.05]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = kmeans_train(df, 100, n_iter=4, sample_fraction=None)

    h1 = {r.vec_id: r.centroid_id for r in
          ivf_assign_hierarchical(df, cent, "vec_id", "embedding").collect()}
    h2 = {r.vec_id: r.centroid_id for r in
          ivf_assign_hierarchical(df, cent, "vec_id", "embedding").collect()}
    assert h1 == h2                      # deterministic
    assert len(h1) == 3000               # every row exactly once
    valid_ids = {r.centroid_id for r in cent.collect()}
    assert set(h1.values()) <= valid_ids  # only real centroids

    flat = {r.vec_id: r.centroid_id for r in
            ivf_assign(df, cent, "vec_id", "embedding").collect()}
    agree = sum(1 for k, v in h1.items() if flat[k] == v) / len(h1)
    assert agree >= 0.9, f"only {agree:.1%} agreement with flat assignment"

    # k below the two-level cutoff: identical to flat by construction
    small = kmeans_train(df, 8, n_iter=2, sample_fraction=None)
    hs = {r.vec_id: r.centroid_id for r in
          ivf_assign_hierarchical(df, small, "vec_id", "embedding").collect()}
    fs = {r.vec_id: r.centroid_id for r in
          ivf_assign(df, small, "vec_id", "embedding").collect()}
    assert hs == fs


def test_ivf_assign_hierarchical_guards(spark):
    """ADVICE r15 + VERDICT r15 item 4: NULL embedding rows raise a CLEAR
    in-plan error naming the row (not an opaque numpy stack trace), in
    both k regimes; the driver-side k x dim materialization refuses past
    max_centroid_bytes with the memory formula, BEFORE collecting."""
    import pytest

    from summingbird_spark.functions.similarity import ivf_assign_hierarchical

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id int, embedding array<float>"
    )
    # small k -> flat fallback regime: same rejection contract
    with pytest.raises(Exception, match="row 2 has a NULL embedding"):
        ivf_assign_hierarchical(df, cent, "vec_id", "embedding").collect()

    # large-k regime: 100 centroids forces two-level
    big = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)],
        "centroid_id int, embedding array<float>",
    )
    with pytest.raises(Exception, match="row 2 has a NULL embedding"):
        ivf_assign_hierarchical(df, big, "vec_id", "embedding").collect()

    # clean rows assign fine under both regimes
    clean = df.where("embedding IS NOT NULL")
    assert ivf_assign_hierarchical(clean, cent, "vec_id", "embedding").count() == 2

    # the driver-materialization bound refuses with the formula named
    with pytest.raises(ValueError, match="max_centroid_bytes"):
        ivf_assign_hierarchical(clean, big, "vec_id", "embedding",
                                max_centroid_bytes=100)

    empty = spark.createDataFrame([], "centroid_id int, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        ivf_assign_hierarchical(clean, empty, "vec_id", "embedding")


def test_ivf_assign_partitioned_matches_hierarchical(spark):
    """The no-driver-matrix layout (the path past hierarchical's
    max_centroid_bytes ceiling, VERDICT r15 item 4): given the same
    centroid table it must produce IDENTICAL assignments to
    ivf_assign_hierarchical — same super training, same full-super
    member routing, same live-super row routing, same first-max
    tie-break over centroid-id-ordered members. Salt must not change
    results; small k falls back to flat exactly; NULL vectors raise."""
    import numpy as np
    import pytest

    from summingbird_spark.functions.similarity import (
        ivf_assign,
        ivf_assign_hierarchical,
        ivf_assign_partitioned,
        kmeans_train,
    )

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((100, 12)) * 4
    rows = [
        (i, [float(x) for x in centers[i % 100] + rng.standard_normal(12) * 0.05])
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = kmeans_train(df, 100, n_iter=4, sample_fraction=None)

    h = {r.vec_id: r.centroid_id for r in
         ivf_assign_hierarchical(df, cent, "vec_id", "embedding").collect()}
    for s in (1, 8):
        p = {r.vec_id: r.centroid_id for r in ivf_assign_partitioned(
            df, cent, "vec_id", "embedding", salt=s).collect()}
        assert p == h, f"salt={s}: partitioned diverged from hierarchical"

    # small k: identical to flat by construction
    small = kmeans_train(df, 8, n_iter=2, sample_fraction=None)
    ps = {r.vec_id: r.centroid_id for r in
          ivf_assign_partitioned(df, small, "vec_id", "embedding").collect()}
    fs = {r.vec_id: r.centroid_id for r in
          ivf_assign(df, small, "vec_id", "embedding").collect()}
    assert ps == fs

    withnull = spark.createDataFrame(
        [(1, [1.0] * 12), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="row 2 has a NULL embedding"):
        ivf_assign_partitioned(withnull, cent, "vec_id", "embedding").collect()
    with pytest.raises(ValueError, match="salt"):
        ivf_assign_partitioned(df, cent, "vec_id", "embedding", salt=0)

    # the curation verb composes with it: same decisions either way
    from summingbird_spark.functions.dedup import semantic_dedup

    sd_h = {r.vec_id: (r.centroid_id, r.is_survivor) for r in semantic_dedup(
        df, 0.98, k_clusters=100, centroids=cent).collect()}
    sd_p = {r.vec_id: (r.centroid_id, r.is_survivor) for r in semantic_dedup(
        df, 0.98, k_clusters=100, centroids=cent,
        assigner="partitioned").collect()}
    assert sd_p == sd_h
    with pytest.raises(ValueError, match="assigner"):
        semantic_dedup(df, 0.98, k_clusters=4, assigner="flat")


def test_semantic_dedup_increment_equals_one_shot(spark, tmp_path):
    """The incremental contract (r16): with monotone ids across
    increments and a FIXED centroid table, k increments of
    semantic_dedup_increment produce EXACTLY the one-shot
    semantic_dedup decisions over the union — survivors, witnesses and
    sims included — while each increment scores only its own rows.
    Re-running the last increment is idempotent; NULL vectors pass
    through and never become residents; missing centroids refuse."""
    import random

    import pytest

    from summingbird_spark.functions.dedup import (
        semantic_dedup,
        semantic_dedup_increment,
    )
    from summingbird_spark.functions.similarity import kmeans_train

    rng = random.Random(17)
    rows = []
    for i in range(120):
        base = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i * 2, [float(x) for x in base]))
        if i % 5 == 0:  # near-dup of the previous row, larger id
            rows.append((i * 2 + 1, [float(x + rng.gauss(0, 0.005)) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = kmeans_train(df, 8, n_iter=3)

    def canon(out):
        return {
            r.vec_id: (r.centroid_id, r.is_survivor, r.nearest_prior_id,
                       None if r.nearest_prior_sim is None
                       else round(r.nearest_prior_sim, 9))
            for r in out.collect()
        }

    one_shot = canon(semantic_dedup(df, 0.95, k_clusters=8, centroids=cent))

    root = str(tmp_path / "residents")
    got = {}
    cuts = [(0, 80), (80, 160), (160, 10**9)]
    for inc, (lo, hi) in enumerate(cuts):
        batch = df.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        got.update(canon(semantic_dedup_increment(
            spark, root, inc, batch, 0.95, cent)))
    assert got == one_shot
    assert sum(1 for v in got.values() if not v[1]) >= 10  # non-degenerate

    # idempotent re-run of the LAST increment: same decisions, and the
    # other increments' rows are untouched
    last = df.where(F.col("vec_id") >= 160)
    again = canon(semantic_dedup_increment(spark, root, 2, last, 0.95, cent))
    assert again == {k: v for k, v in one_shot.items() if k >= 160}

    # NULL vectors: survivor, NULL centroid, never a resident
    nul = spark.createDataFrame(
        [(10_001, None)], "vec_id long, embedding array<float>"
    )
    out = canon(semantic_dedup_increment(spark, root, 3, nul, 0.95, cent))
    assert out == {10_001: (None, True, None, None)}
    residents = spark.read.parquet(root)
    assert residents.where("vec_id = 10001").count() == 0
    # all prior valid rows ARE residents (dropped ones included)
    assert residents.where("increment < 3").count() == df.count()

    with pytest.raises(ValueError, match="centroids"):
        semantic_dedup_increment(spark, root, 4, df, 0.95, None)
    with pytest.raises(ValueError, match="assigner"):
        semantic_dedup_increment(spark, root, 4, df, 0.95, cent, assigner="x")
