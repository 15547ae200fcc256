"""Unit tests for the custom operators: loop join (general scanLeft),
as-of join modes, simhash candidates, multimodal plumbing.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from summingbird_spark.operators.asof import as_of_join
from summingbird_spark.operators.loopjoin import loop_join


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_loop_join_general_scanleft(spark):
    """The non-linear case: transform depends on the joined state
    (TestGraphs.loopJoinInScala semantics) — value feeds back as
    value + (state or 0) // 2."""
    rows = [(ts(i), "k", i + 1) for i in range(6)]
    df = spark.createDataFrame(rows, "t timestamp, key string, v long")
    out = loop_join(
        df,
        "key",
        "t",
        "v",
        out_col="joined",
        semigroup="sum",
        transform=lambda v, state: v + (state or 0) // 2,
    )
    got = {r.v: r.joined for r in out.collect()}
    # python oracle scan
    state = None
    want = {}
    for i in range(6):
        v = i + 1
        want[v] = state
        upd = v + (state or 0) // 2
        state = upd if state is None else state + upd
    assert got == want


def test_loop_join_general_path_null_values_and_null_keys(spark):
    """The general (mapInPandas) scan must treat SQL NULLs the way the
    JVM window fast path does (r12 self-review find, same class as the
    streaming summer's NULL poisoning):

    1. a NULL value is SKIPPED, not lifted — pandas shows it as NaN and
       the old ``v is not None`` check let it through, so a set-semigroup
       state became {nan} and a sum state NaN forever;
    2. a NULL key is ONE run, not |rows| runs — NaN != NaN reset the
       state on every row, so NULL-keyed rows never saw prior state.
    """
    rows = [
        (ts(0), "k", 1), (ts(1), "k", None), (ts(2), "k", 3),
        (ts(3), None, 5), (ts(4), None, None), (ts(5), None, 7),
    ]
    df = spark.createDataFrame(rows, "t timestamp, key string, v long")
    # 'set' has no JVM fast path → exercises the general scan
    out = loop_join(df, "key", "t", "v", out_col="seen", semigroup="set")
    got = {(r.key, r.v): r.seen for r in out.collect()}
    assert got[("k", 1)] is None
    assert sorted(got[("k", None)]) == [1]      # null value did not poison
    assert sorted(got[("k", 3)]) == [1]         # ...and was not folded
    assert got[(None, 5)] is None               # null key: fresh state
    assert sorted(got[(None, None)]) == [5]     # ...ONE run, state carried
    assert sorted(got[(None, 7)]) == [5]

    # parity with the JVM fast path on the same null-bearing data
    fast = loop_join(df, "key", "t", "v", out_col="s", semigroup="sum_long")
    slow = loop_join(df, "key", "t", "v", out_col="s", semigroup="sum_long",
                     transform=lambda v, state: None if v is None or v != v
                     else int(v))
    f = {(r.key, r.v): r.s for r in fast.collect()}
    s = {(r.key, r.v): r.s for r in slow.collect()}
    assert f == s == {("k", 1): None, ("k", None): 1, ("k", 3): 1,
                      (None, 5): None, (None, None): 5, (None, 7): 5}


def test_asof_join_deletion_semantics(spark):
    """A NULL changelog value is a deletion: later lookups see None, not
    the stale value (BatchedService changelog contract, FIXTURES F4)."""
    left = spark.createDataFrame(
        [(ts(1), "k"), (ts(3), "k"), (ts(5), "k")], "t timestamp, key string"
    )
    chg = spark.createDataFrame(
        [(ts(0), "k", "v0"), (ts(2), "k", None), (ts(4), "k", "v4")],
        "t timestamp, key string, val string",
    )
    out = as_of_join(left, chg, "key", "t", "t", ["val"])
    got = {r.t.minute: r.val for r in out.collect()}
    assert got == {1: "v0", 3: None, 5: "v4"}


def test_asof_join_max_age_window(spark):
    """BatchedWindowService: only right rows within the window count."""
    left = spark.createDataFrame(
        [(ts(1), "k"), (ts(30), "k")], "t timestamp, key string"
    )
    chg = spark.createDataFrame([(ts(0), "k", "v0")], "t timestamp, key string, val string")
    out = as_of_join(
        left, chg, "key", "t", "t", ["val"], max_age=F.lit(600)  # 10 minutes
    )
    got = {r.t.minute: r.val for r in out.collect()}
    assert got == {1: "v0", 30: None}


def test_asof_sum_subresolution_max_age_rejected(spark):
    """mode='sum' max_age is a long µs RANGE bound: an age finer than
    Spark's µs timestamp resolution must raise, not silently truncate to
    a narrower window (1e-7 s -> 0 µs)."""
    left = spark.createDataFrame([(ts(1), "k")], "t timestamp, key string")
    chg = spark.createDataFrame(
        [(ts(0), "k", 1.0)], "t timestamp, key string, v double"
    )
    with pytest.raises(ValueError, match="whole number of"):
        as_of_join(
            left, chg, "key", "t", "t", ["v"], mode="sum", max_age=1e-7
        ).collect()


def test_asof_max_age_bound_exclusive_both_modes(spark):
    """The reference window bound is 0 <= t_l - t_r < max_age
    (BatchedWindowService.scala:35-72): a right row at EXACTLY
    t_l - max_age is excluded in both modes; one inside the bound counts."""
    left = spark.createDataFrame([(ts(10), "k")], "t timestamp, key string")
    chg = spark.createDataFrame(
        # exactly 600s before the probe (excluded) and 599s before (included)
        [(ts(0), "k", 100.0), (ts(0) + dt.timedelta(seconds=1), "k", 7.0)],
        "t timestamp, key string, v double",
    )
    sum_out = as_of_join(
        left, chg, "key", "t", "t", ["v"], mode="sum", max_age=600
    ).collect()
    assert [r.v for r in sum_out] == [7.0]
    latest_out = as_of_join(
        left, chg, "key", "t", "t", ["v"], mode="latest", max_age=600
    ).collect()
    assert [r.v for r in latest_out] == [7.0]


def test_simhash_candidates_find_near_dups(spark):
    from summingbird_spark.functions.dedup import simhash_table, simhash_candidates

    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + "extra"),          # near-dup of 1
            (3, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    sh = simhash_table(docs, "doc_id", "text")
    pairs = simhash_candidates(sh, "doc_id", "simhash", max_hamming=10)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_arrow_matches_shuffle(spark):
    """The shuffle-free Arrow vote kernel must be bit-identical to the
    explode + wide-aggregate form, for both hash families, including
    duplicate-token weighting and tokenless-document dropping."""
    from summingbird_spark.functions.dedup import simhash_table

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha alpha beta"),
            (2, "the quick brown fox jumps over the lazy dog " * 5),
            (3, "   "),  # tokenless: dropped by both paths
            (4, "Single"),
            (5, "mixed CASE Mixed case MIXED"),
        ],
        "doc_id long, text string",
    )
    for portable in (True, False):
        a = {
            r.doc_id: r.simhash
            for r in simhash_table(docs, "doc_id", "text", portable=portable).collect()
        }
        s = {
            r.doc_id: r.simhash
            for r in simhash_table(
                docs, "doc_id", "text", portable=portable, arrow=False
            ).collect()
        }
        assert a == s, f"portable={portable}: {a} != {s}"
        assert 3 not in a and len(a) == 4


def test_multimodal_feature_and_frames(spark):
    from summingbird_spark.functions.multimodal import (
        extract_features,
        frame_sample,
        pack_media,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 10)], "doc_id long, text string"
    ).withColumn("blob", F.encode(F.col("text"), "utf-8"))
    media = pack_media(docs, "blob", "application/octet-stream")

    feats = {r.doc_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 100 and feats[2].n_bytes == 10
    import hashlib

    assert feats[1].checksum == hashlib.md5(b"a" * 100).hexdigest()

    frames = frame_sample(media, every_n_bytes=64, frame_len=8).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc[1]) == 2  # 100 bytes / 64
    assert len(per_doc[2]) == 1

    # decoder stubs fail loudly, not silently
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="pil")

    # NULL payloads (corrupt corpus rows) null-propagate, never crash
    # the task (bytes(None) did, r12): features all-null with id kept,
    # frame sampling explodes to zero frames, resize emits null payload
    from summingbird_spark.functions.multimodal import resize_images

    withnull = media.select("doc_id", "payload").unionByName(
        spark.createDataFrame([(3, None)], "doc_id long, payload binary")
    )
    nf = {r.doc_id: r for r in extract_features(withnull).collect()}
    assert nf[3].n_bytes is None and nf[3].checksum is None
    assert nf[1].n_bytes == 100  # non-null rows unaffected
    got_frames = frame_sample(withnull, every_n_bytes=64, frame_len=8)
    assert got_frames.where("doc_id = 3").count() == 0
    rz = {r.doc_id: r for r in resize_images(withnull, (4, 4)).collect()}
    assert rz[3].payload is None and rz[3].width is None


def _recall_at_5(exact_rows, approx_rows, n_queries):
    exact = {}
    for r in exact_rows:
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in approx_rows:
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    return hits / (5 * n_queries)


@pytest.fixture(scope="module")
def clustered_corpus(spark):
    """A corpus where ANN is well-posed: 12 well-separated unit centers,
    40 points each at cosine ≈ 0.95 to their center, so a query's true
    top-5 are same-cluster points. (The sf* embeddings table is
    near-random — its 5th neighbors sit at cosine ≈ 0.3, a regime where
    EVERY sublinear ANN method degenerates to a scan; recall must be
    measured where neighbors are actually near.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 32, 12, 40
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        for i in range(per):
            # total noise norm ≈ 0.33 (NOT per-dim): within-cluster cosine
            # ≈ 1/(1 + 0.33²) ≈ 0.9
            v = centers[c] + (0.33 / np.sqrt(dim)) * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((c * per + i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_lsh_topk_recall_vs_brute_force(spark, clustered_corpus):
    """Multi-table multi-probe LSH at the scale defaults (8 tables ×
    2^12 buckets): recall@5 ≥ 0.9 against the exact baseline."""
    from summingbird_spark.functions.similarity import brute_force_topk, lsh_topk

    queries = clustered_corpus.where(F.col("vec_id") % 40 == 0)
    n_q = queries.count()
    exact = brute_force_topk(clustered_corpus, queries, k=5).collect()
    approx = lsh_topk(clustered_corpus, queries, k=5).collect()
    recall = _recall_at_5(exact, approx, n_q)
    assert recall >= 0.9, f"LSH recall@5 = {recall}"


def test_lsh_topk_recall_small_corpus_params(spark):
    """On the (near-random) sf0.01 embeddings with corpus-sized planes,
    recall@5 stays ≥ 0.9 — the planes knob trades bucket size for recall
    exactly as documented."""
    from summingbird_spark.functions.similarity import brute_force_topk, lsh_topk
    from summingbird_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5, planes=4, tables=8).collect()
    recall = _recall_at_5(exact, approx, 10)
    assert recall >= 0.9, f"LSH small-corpus recall@5 = {recall}"


def test_ivf_topk_recall_vs_brute_force(spark, clustered_corpus):
    """k-means-trained IVF probing nprobe of 12 lists: recall@5 ≥ 0.9."""
    from summingbird_spark.functions.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        kmeans_train,
    )

    queries = clustered_corpus.where(F.col("vec_id") % 40 == 0)
    n_q = queries.count()
    centroids = kmeans_train(clustered_corpus, k=12, n_iter=4)
    assert centroids.count() <= 12  # empty clusters may drop
    # index build once, probe with the persisted assignment
    assigned = ivf_assign(clustered_corpus, centroids)
    exact = brute_force_topk(clustered_corpus, queries, k=5).collect()
    approx = ivf_topk(
        clustered_corpus, queries, centroids, k=5, nprobe=3, assigned=assigned
    ).collect()
    recall = _recall_at_5(exact, approx, n_q)
    assert recall >= 0.9, f"IVF recall@5 = {recall}"


def _exact_pairs_numpy(rows, threshold):
    import numpy as np

    ids = np.array([r[0] for r in rows])
    M = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    ia, ib = np.nonzero(S >= threshold)
    return {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(ia, ib)
        if ids[i] != ids[j]
    }


def test_embedding_near_dup_block_exact(spark, clustered_corpus):
    """Tile-matmul near-dup (the no-driver-state exact path) == numpy
    all-pairs oracle; recall 1.0 by construction, every unordered pair
    emitted exactly once (self-tile double-count and cross-tile
    orientation both exercised at blocks=5)."""
    from summingbird_spark.functions.similarity import embedding_near_dup_pairs

    rows = clustered_corpus.select("vec_id", "embedding").collect()
    expected = _exact_pairs_numpy(rows, 0.85)
    got = [
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            clustered_corpus, 0.85, method="block", blocks=5
        ).collect()
    ]
    assert len(got) == len(set(got)), "pair emitted twice"
    assert set(got) == expected


def test_embedding_near_dup_lsh_blocked_recall(spark, clustered_corpus):
    """LSH-blocked + exact-verify near-dup at a true near-dup threshold
    (0.85 ⇒ θ ≤ 32°): precision 1.0 (verify kernel is exact) and recall
    ≥ 0.99 at the defaults — deterministic planes, so this is a stable
    measurement, not a flaky bound."""
    from summingbird_spark.functions.similarity import embedding_near_dup_pairs

    rows = clustered_corpus.select("vec_id", "embedding").collect()
    expected = _exact_pairs_numpy(rows, 0.85)
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            clustered_corpus, 0.85, method="lsh"
        ).collect()
    }
    assert got <= expected, "verify kernel admitted a below-threshold pair"
    recall = len(got & expected) / max(len(expected), 1)
    assert recall >= 0.99, f"LSH-blocked near-dup recall = {recall}"


def test_salted_agg_set_union_hot_key(spark):
    from summingbird_spark.operators.skew import salted_agg

    import pyspark.sql.functions as F

    df = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 500).alias("v")
    ).union(spark.range(3).select(F.lit("cold").alias("k"), F.col("id").alias("v")))
    out = {r.k: list(r.value) for r in salted_agg(df, "k", "v", "set", buckets=16).collect()}
    assert out["hot"] == sorted(set(range(500)))
    assert out["cold"] == [0, 1, 2]


def test_dedup_stream_within_watermark(spark, tmp_path):
    import datetime as dt
    import glob, shutil

    from summingbird_spark.streaming.dedup import dedup_stream

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, "dup text"), (t0 + dt.timedelta(minutes=1), "dup text"),
        (t0 + dt.timedelta(minutes=2), "unique one"),
        (t0 + dt.timedelta(minutes=3), "dup text"),
    ]
    (tmp_path / "src").mkdir()
    spark.createDataFrame(rows, "ts timestamp, text string").coalesce(1) \
        .write.parquet(str(tmp_path / "w"))
    for f in glob.glob(str(tmp_path / "w" / "*.parquet")):
        shutil.move(f, str(tmp_path / "src" / "c.parquet"))

    s = spark.readStream.schema("ts timestamp, text string").parquet(str(tmp_path / "src"))
    out = dedup_stream(s, text_col="text", time_col="ts", watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = sorted(r.text for r in spark.sql("SELECT text FROM dd").collect())
    assert got == ["dup text", "unique one"]


# ---- loop-join planner detection (round 2) ---------------------------------


def _loop_events(spark):
    rows = [(ts(i), f"k{i % 3}", float(i % 7) + 1, i) for i in range(60)]
    return spark.createDataFrame(rows, "ts timestamp, key string, value double, eid long")


def _window_oracle(rows):
    from collections import defaultdict

    run, out = defaultdict(lambda: None), {}
    for t, k, v, eid in sorted(rows, key=lambda r: (r[0], r[3])):
        out[eid] = run[k]
        run[k] = v if run[k] is None else run[k] + v
    return out


def test_dsl_loop_join_linear_window_path(spark):
    """left_join(StoreService) compiles the self-referential running fold
    (ScaldingPlatform.scala:430-469) — and the linear case stays JVM-side
    (a Window aggregate, no Python eval in the plan)."""
    import summingbird_spark as sb
    from summingbird_spark import source, to_dataframe

    df = _loop_events(spark)
    svc = sb.StoreService(value="value", out_col="seen", order_by=["eid"])
    p = source(df, time_col="ts").left_join(svc, on="key")
    out = to_dataframe(spark, p)
    got = {r.eid: r.seen for r in out.collect()}
    want = _window_oracle([(r.ts, r.key, r.value, r.eid) for r in df.collect()])
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "FlatMapGroupsInPandas" not in plan and "EvalPython" not in plan


def test_dsl_loop_join_seeded_by_store_snapshot(spark, tmp_path):
    import summingbird_spark as sb
    from summingbird_spark import source, to_dataframe

    store = sb.VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    init = spark.createDataFrame([("k0", 100.0), ("k1", 50.0)], "key string, value double")
    store.write_snapshot(init, 0)

    df = _loop_events(spark)
    svc = sb.StoreService(store=store, value="value", out_col="seen", order_by=["eid"])
    p = source(df, time_col="ts").left_join(svc, on="key")
    got = {r.eid: r.seen for r in to_dataframe(spark, p).collect()}
    base = _window_oracle([(r.ts, r.key, r.value, r.eid) for r in df.collect()])
    seed = {"k0": 100.0, "k1": 50.0}
    rows = {r.eid: r.key for r in df.collect()}
    for eid, k in rows.items():
        w = base[eid]
        s = seed.get(k)
        want = s if w is None else (w if s is None else w + s)
        assert got[eid] == want, eid


def test_loop_join_sandwich_valid_and_rejections(spark, tmp_path):
    """The validated sandwich: left_join(StoreService(S)) → value
    transforms → sum_by_key(store=S) plans; a flatMap in between, or a
    semigroup mismatch, is rejected (Service.scala:78-105)."""
    import summingbird_spark as sb
    from summingbird_spark import source, to_dataframe

    df = _loop_events(spark)
    store = sb.VersionedBatchStore(str(tmp_path / "s"), ["key"], "sum")
    svc = sb.StoreService(store=store, value="value", out_col="seen",
                          order_by=["eid"])

    ok = (
        source(df, time_col="ts")
        .left_join(svc, on="key")
        .map(flag=F.col("seen").isNotNull())
        .filter("value > 0")
        .sum_by_key("key", "value", semigroup="sum", store=store)
    )
    rows = to_dataframe(spark, ok).collect()
    assert {r.key for r in rows} == {"k0", "k1", "k2"}

    bad_shape = (
        source(df, time_col="ts")
        .left_join(svc, on="key")
        .flat_map("array(value, value)", alias="v2", keep=["key"])
        .sum_by_key("key", "v2", semigroup="sum", store=store)
    )
    with pytest.raises(TypeError, match="value-transforms"):
        to_dataframe(spark, bad_shape)

    bad_sg = (
        source(df, time_col="ts")
        .left_join(svc, on="key")
        .sum_by_key("key", "value", semigroup="max", store=store)
    )
    with pytest.raises(TypeError, match="diverge"):
        to_dataframe(spark, bad_sg)

    # a plain-service left_join BETWEEN the StoreService join and the
    # summer is not a value-transform (a dup-keyed dimension duplicates
    # left rows) — the walk must record it and keep going, not stop at
    # the first LeftJoin it meets
    dim = spark.createDataFrame([("k0", "x")], "key string, tag string")
    plain = sb.Service(dim, key_cols=["key"])
    bad_mid_join = (
        source(df, time_col="ts")
        .left_join(svc, on="key")
        .left_join(plain, on="key")
        .sum_by_key("key", "value", semigroup="sum", store=store)
    )
    with pytest.raises(TypeError, match="value-transforms"):
        to_dataframe(spark, bad_mid_join)


# ---- multimodal image decode (round 2) -------------------------------------


def _tiny_png(w, h, rgb):
    """A valid PNG built with stdlib only (zlib + struct)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_decode_header_parse(spark):
    """decoder='image' really decodes: dimensions come out of the PNG/GIF/
    JPEG container headers even with no codec library installed."""
    from summingbird_spark.functions.multimodal import extract_features

    png = _tiny_png(5, 3, (10, 20, 30))
    gif = b"GIF89a" + (7).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00" * 20
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif))], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in extract_features(df, decoder="image").collect()}
    assert (got[1].width, got[1].height) == (5, 3)
    assert (got[2].width, got[2].height) == (7, 2)
    assert got[1].n_bytes == len(png) and got[1].checksum is not None


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="Pillow not installed (header-only fallback covered above)",
)
def test_image_decode_full_pil(spark):
    """With Pillow present, decoder='image' decodes pixels: mean_luma of a
    uniform image equals its luma value."""
    from summingbird_spark.functions.multimodal import extract_features

    png = _tiny_png(4, 4, (100, 100, 100))
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    r = extract_features(df, decoder="image").collect()[0]
    assert (r.width, r.height) == (4, 4)
    assert r.mean_luma is not None and abs(r.mean_luma - 100) <= 2


def test_audio_decode_wav_parse(spark):
    """decoder='audio' really decodes: fmt-chunk metadata and mean |amp|
    of the PCM16 samples come out of a stdlib-written WAV, no codec
    library involved; non-RIFF payloads raise explicitly."""
    import io
    import math
    import struct
    import wave

    from summingbird_spark.functions.multimodal import (
        _audio_features, extract_features,
    )

    buf = io.BytesIO()
    rate, n = 8000, 800
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [int(10000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
        w.writeframes(struct.pack(f"<{n}h", *samples))
    wav = buf.getvalue()

    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    (r,) = extract_features(df, decoder="audio").collect()
    assert (r.channels, r.sample_rate, r.bits) == (1, 8000, 16)
    assert r.duration_ms == n * 1000 // rate  # 100 ms
    # mean |sin| * 10000/32768 ≈ 0.6366 * 0.3052 ≈ 0.194
    assert abs(r.mean_abs - 0.194) < 0.01
    assert r.n_bytes == len(wav)

    with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        _audio_features(b"ID3\x04mp3-ish-bytes" + b"\x00" * 64)


def test_resize_images_plumbing_and_roundtrip(spark):
    """resize_images: one row in → one row out, schema (id, payload,
    width, height); fit math preserves aspect from the REAL parsed
    header; the emitted payload is a valid PNG whose header round-trips
    through extract_features at the new dimensions; deterministic."""
    from summingbird_spark.functions.multimodal import (
        extract_features,
        resize_images,
    )

    big = _tiny_png(64, 16, (10, 20, 30))   # 4:1 aspect
    small = _tiny_png(4, 4, (1, 2, 3))      # already inside the box
    df = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(small))], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in resize_images(df, (16, 16)).collect()}
    assert set(out) == {1, 2}
    assert (out[1].width, out[1].height) == (16, 4)  # aspect-preserving fit
    assert (out[2].width, out[2].height) == (4, 4)   # fit never upscales

    # the resized payload is a real PNG: the header parser agrees
    rdf = spark.createDataFrame(
        [(i, bytearray(bytes(r.payload))) for i, r in out.items()],
        "doc_id long, payload binary",
    )
    feats = {r.doc_id: r for r in extract_features(rdf, decoder="image").collect()}
    assert (feats[1].width, feats[1].height) == (16, 4)
    assert (feats[2].width, feats[2].height) == (4, 4)

    # deterministic: same inputs, byte-identical outputs
    again = {r.doc_id: bytes(r.payload) for r in resize_images(df, (16, 16)).collect()}
    assert {i: bytes(r.payload) for i, r in out.items()} == again


def test_resize_images_stretch_and_errors(spark):
    from summingbird_spark.functions.multimodal import resize_images

    png = _tiny_png(8, 8, (9, 9, 9))
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    r = resize_images(df, (5, 3), fit=False).collect()[0]
    assert (r.width, r.height) == (5, 3)  # exact stretch

    with pytest.raises(ValueError):
        resize_images(df, (0, 3))
    with pytest.raises(ValueError):
        resize_images(df, (3, 3), decoder="nope")


def test_loop_join_lifted_carrier_identity_fold(spark):
    """transform=None folds py_lift(value) — a 'set' store accumulates
    {v}, not raw strings char-exploded into the carrier (the r6 py_lift
    bug class, ADVICE r6 loopjoin.py); out_col defaults to the CARRIER
    type (array<string>)."""
    rows = [(ts(i), "k", w) for i, w in enumerate(["ab", "cd", "ab", "ef"])]
    df = spark.createDataFrame(rows, "t timestamp, key string, v string")
    out = loop_join(df, "key", "t", "v", out_col="seen", semigroup="set")
    assert dict(out.dtypes)["seen"] == "array<string>"
    got = {r.t.minute: r.seen for r in out.collect()}
    assert got == {0: None, 1: ["ab"], 2: ["ab", "cd"], 3: ["ab", "cd"]}


def test_loop_join_count_semigroup_matches_window_fast_path(spark):
    """'count' takes the JVM window fast path; the general mapInPandas
    path (forced via a lifted-carrier cousin) agrees with it on the
    prior-row tally — both fold the LIFT (1 per row), not the raw value."""
    rows = [(ts(i), f"k{i % 2}", 100 + i) for i in range(8)]
    df = spark.createDataFrame(rows, "t timestamp, key string, v long")
    fast = loop_join(df, "key", "t", "v", out_col="n", semigroup="count")
    got = {(r.key, r.t.minute): r.n for r in fast.collect()}
    want = {(f"k{i % 2}", i): (i // 2 if i >= 2 else None) for i in range(8)}
    assert got == want


def test_dsl_loop_join_lifted_carriers_match_streaming_fold(spark):
    """The batch compile of left_join(StoreService) must fold LIFTED
    deltas, like the streaming compile (streaming_self_loop's py_lift) —
    raw-merging diverged batch from stream for every non-identity
    carrier (review r7 finding). 'set' takes the generic collect+fold
    window; 'count' takes the _WINDOW_MERGE fast path (NULL before the
    first fold, then prior-row tallies)."""
    import summingbird_spark as sb
    from summingbird_spark import source, to_dataframe

    rows = [(ts(i), "k", w, i) for i, w in enumerate(["ab", "cd", "ab", "ef"])]
    df = spark.createDataFrame(rows, "ts timestamp, key string, value string, eid long")
    svc = sb.StoreService(value="value", out_col="seen", semigroup="set",
                          order_by=["eid"])
    p = source(df, time_col="ts").left_join(svc, on="key")
    got = {r.eid: r.seen for r in to_dataframe(spark, p).collect()}
    assert got == {0: None, 1: ["ab"], 2: ["ab", "cd"], 3: ["ab", "cd"]}

    svc_n = sb.StoreService(value="value", out_col="n", semigroup="count",
                            order_by=["eid"])
    pn = source(df, time_col="ts").left_join(svc_n, on="key")
    got_n = {r.eid: r.n for r in to_dataframe(spark, pn).collect()}
    assert got_n == {0: None, 1: 1, 2: 2, 3: 3}


def test_kmeans_train_deterministic_under_duplicate_ids(spark):
    """Init ordering ties (duplicate ids, hash collisions) are broken by
    (id, vector), so rebuilds are byte-identical even on a corpus whose
    id column is not unique (ADVICE r10)."""
    from summingbird_spark.functions.similarity import kmeans_train

    rows = []
    for i in range(16):
        v = [0.0] * 4
        v[i % 4] = 1.0
        v[(i + 1) % 4] = 0.1 * (i % 3)
        rows.append((i % 8, v))  # every id appears twice, vectors differ
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(
        kmeans_train(df, k=4, n_iter=2).collect(),
        key=lambda r: r["centroid_id"],
    )
    b = sorted(
        kmeans_train(df, k=4, n_iter=2).collect(),
        key=lambda r: r["centroid_id"],
    )
    assert [(r["centroid_id"], r["embedding"]) for r in a] == [
        (r["centroid_id"], r["embedding"]) for r in b
    ]


def test_kmeans_train_rejects_ragged_vectors(spark):
    """A corpus with mixed vector lengths must fail loudly with the gap,
    not silently truncate a centroid (ADVICE r10)."""
    from summingbird_spark.functions.similarity import kmeans_train

    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged|positions"):
        kmeans_train(df, k=2, n_iter=1)


def test_similarity_kernels_null_propagate_corrupt_embeddings(spark):
    """NULL embeddings (corrupt corpus rows — they exist at 100 TB) must
    null-propagate through every numpy kernel instead of crashing the
    task on np.stack(None) (r12): LSH signatures NULL (never bucketed),
    near-dup pairs exclude null rows (both block and lsh methods),
    gram/PCA skip them, projection yields NULL."""
    from pyspark.sql import functions as F

    from summingbird_spark.functions.similarity import (
        embedding_near_dup_pairs,
        lsh_table_signatures,
        pca_project,
        pca_train,
    )

    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0]), (2, None),
            (3, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    sigs = {r.vec_id: r.s for r in emb.select(
        "vec_id", lsh_table_signatures(F.col("embedding"), 2, 4).alias("s")
    ).collect()}
    assert sigs[2] is None and sigs[0] is not None

    for method in ["block", "lsh"]:
        pairs = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(
                emb, 0.9, method=method, **({"blocks": 2} if method == "block" else {})
            ).collect()
        }
        assert pairs == {(0, 1)}, method

    comp, mu = pca_train(emb, k=2)  # gram_stats skips the NULL row
    proj = {r.vec_id: r.pca for r in pca_project(emb, comp, mu).collect()}
    assert proj[2] is None and proj[0] is not None and len(proj[0]) == 2
