"""semantic_dedup_stream — online SemDeDup over micro-batches.

Contract under test (streaming/dedup.py:semantic_dedup_stream):
* monotone-id chunk replay == one-shot batch ``semantic_dedup`` exactly
  (ids, survivors, witnesses; sims to 1e-9) — the same equivalence
  ``semantic_dedup_increment`` is graded by;
* watermark-horizon eviction forgets residents, so a duplicate beyond
  the horizon re-emits as a survivor (at-least-once, batch reconciles);
* ``max_residents`` caps per-cluster state (newest kept);
* NULL vectors pass through as survivors, never enter state;
* a stale ``assigned=`` artifact refuses in-plan under 'error' and
  routes through under 'keep' (the batch contract, streamed).
"""

import datetime as dt
import glob
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from summingbird_spark.streaming.dedup import semantic_dedup_stream

DIM = 4
THRESH = 0.9
SCHEMA = "vec_id bigint, embedding array<double>, ts timestamp"


def _t(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def _vec(cluster, kind):
    """Well-separated clusters so every assigner agrees: `dup` rows are
    cosine ~0.999 to the cluster base, `far` rows ~0.71 (below 0.9 —
    survive, same cluster)."""
    base = np.zeros(DIM)
    base[cluster] = 1.0
    if kind == "dup":
        v = base + 0.02 * np.roll(base, 1)
    elif kind == "far":
        v = base + 1.0 * np.roll(base, 1)
    else:
        v = base
    return [float(x) for x in v / np.linalg.norm(v)]


def _centroids(spark, clusters=(0, 1, 2)):
    rows = [(c, _vec(c, "base")) for c in clusters]
    return spark.createDataFrame(rows, "centroid_id int, embedding array<double>")


def _stage(spark, d, chunks):
    """One parquet file per chunk => one micro-batch per trigger."""
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(chunks):
        tmp = os.path.join(d, f"w{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
        shutil.move(glob.glob(tmp + "/*.parquet")[0], os.path.join(d, f"chunk{i}.parquet"))
        shutil.rmtree(tmp)
    return d


def _run(spark, src_dir, out_dir, **kwargs):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = semantic_dedup_stream(stream, THRESH, **kwargs)
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", out_dir + ".ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    return spark.read.parquet(out_dir)


def _rows3():
    """Three monotone-id chunks over 3 clusters with dups within and
    ACROSS chunks, plus a NULL vector."""
    return [
        [  # chunk 0
            (0, _vec(0, "base"), _t(0)),
            (1, _vec(1, "base"), _t(1)),
            (2, _vec(0, "dup"), _t(2)),      # dropped vs 0, in-batch
            (3, _vec(2, "base"), _t(3)),
        ],
        [  # chunk 1
            (10, _vec(0, "dup"), _t(4)),     # dropped vs resident 0
            (11, _vec(1, "far"), _t(5)),     # same cluster, survives
            (12, None, _t(6)),               # NULL vector
        ],
        [  # chunk 2
            (20, _vec(1, "dup"), _t(7)),     # dropped vs resident 1
            (21, _vec(2, "far"), _t(8)),     # survives
            (22, _vec(0, "dup"), _t(9)),     # dropped (witness: min sim arg)
        ],
    ]


def _all_rows():
    return [r for c in _rows3() for r in c]


def test_matches_one_shot_semantic_dedup(spark, tmp_path):
    from summingbird_spark.functions.dedup import semantic_dedup

    cents = _centroids(spark)
    src = _stage(spark, str(tmp_path / "src"), _rows3())
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=cents, time_col="ts",
    ).select("vec_id", "centroid_id", "is_survivor",
             "nearest_prior_id", "nearest_prior_sim")

    df = spark.createDataFrame(_all_rows(), SCHEMA).drop("ts")
    one = semantic_dedup(df, THRESH, k_clusters=3, centroids=cents)

    j = got.alias("s").join(one.alias("o"), "vec_id", "outer")
    rows = j.select(
        "vec_id",
        F.col("s.is_survivor").alias("ss"), F.col("o.is_survivor").alias("os"),
        F.col("s.centroid_id").alias("sc"), F.col("o.centroid_id").alias("oc"),
        F.col("s.nearest_prior_id").alias("sp"),
        F.col("o.nearest_prior_id").alias("op"),
        F.col("s.nearest_prior_sim").alias("sv"),
        F.col("o.nearest_prior_sim").alias("ov"),
    ).collect()
    assert len(rows) == len(_all_rows())
    for r in rows:
        assert r.ss == r.os, r
        assert r.sc == r.oc, r
        assert r.sp == r.op, r
        if r.sv is None:
            assert r.ov is None, r
        else:
            assert abs(r.sv - r.ov) < 1e-9, r
    # non-degenerate: the scenario drops rows and carries witnesses
    dropped = [r for r in rows if not r.ss]
    assert {r.vec_id for r in dropped} == {2, 10, 20, 22}


def test_watermark_evicts_residents(spark, tmp_path):
    """Resident behind the horizon is forgotten: its late duplicate
    re-emits as a survivor (at-least-once)."""
    t0 = dt.datetime(2024, 1, 1)
    far = t0 + dt.timedelta(days=10)
    chunks = [
        [(1, _vec(0, "base"), t0)],
        # advances the watermark to far - 1d (cluster 1: no interaction)
        [(2, _vec(1, "base"), far)],
        # duplicate of row 1 — resident 1 (ts=t0 < wm) evicted => survives
        [(3, _vec(0, "dup"), far)],
    ]
    src = _stage(spark, str(tmp_path / "src"), chunks)
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts", watermark="1 day",
    )
    by_id = {r.vec_id: r for r in got.collect()}
    assert len(by_id) == 3
    assert by_id[1].is_survivor
    assert by_id[3].is_survivor, "evicted resident must not witness a drop"
    assert by_id[3].nearest_prior_id is None


def test_no_watermark_keeps_residents(spark, tmp_path):
    """Same replay WITHOUT a watermark: the old resident still drops the
    late duplicate (state unbounded by choice)."""
    t0 = dt.datetime(2024, 1, 1)
    far = t0 + dt.timedelta(days=10)
    chunks = [
        [(1, _vec(0, "base"), t0)],
        [(2, _vec(1, "base"), far)],
        [(3, _vec(0, "dup"), far)],
    ]
    src = _stage(spark, str(tmp_path / "src"), chunks)
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts",
    )
    by_id = {r.vec_id: r for r in got.collect()}
    assert not by_id[3].is_survivor
    assert by_id[3].nearest_prior_id == 1


def test_max_residents_caps_state(spark, tmp_path):
    """Cap=1 keeps only the newest resident per cluster: a duplicate of
    the EVICTED older resident re-emits as a survivor."""
    chunks = [
        [(1, _vec(0, "base"), _t(0))],
        [(2, _vec(0, "far"), _t(1))],   # survives (cos ~0.71), displaces 1
        [(3, _vec(0, "dup"), _t(2))],   # dup of 1 — but 1 was evicted
    ]
    src = _stage(spark, str(tmp_path / "src"), chunks)
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts", max_residents=1,
    )
    by_id = {r.vec_id: r for r in got.collect()}
    assert by_id[2].is_survivor
    assert by_id[3].is_survivor, "dup of capped-out resident passes through"
    # witness, if any, can only be the surviving resident 2 (cos < 0.9)
    assert by_id[3].nearest_prior_id in (None, 2)


def test_null_vectors_pass_through(spark, tmp_path):
    src = _stage(
        spark, str(tmp_path / "src"),
        [[(1, None, _t(0)), (2, _vec(0, "base"), _t(0))]],
    )
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts",
    )
    by_id = {r.vec_id: r for r in got.collect()}
    assert by_id[1].is_survivor and by_id[1].centroid_id is None
    assert by_id[2].is_survivor and by_id[2].centroid_id == 0


def test_assigned_static_join_and_stale_artifact(spark, tmp_path):
    """assigned= drives a stream-static broadcast join; a stale artifact
    refuses under 'error' and passes through under 'keep'."""
    rows = [(1, _vec(0, "base"), _t(0)), (2, _vec(0, "dup"), _t(1))]
    assigned_full = spark.createDataFrame(
        [(1, 0), (2, 0)], "vec_id bigint, centroid_id int"
    )
    src = _stage(spark, str(tmp_path / "src"), [rows])
    got = _run(
        spark, src, str(tmp_path / "out"),
        assigned=assigned_full, time_col="ts",
    )
    by_id = {r.vec_id: r for r in got.collect()}
    assert by_id[1].is_survivor and not by_id[2].is_survivor

    stale = spark.createDataFrame([(1, 0)], "vec_id bigint, centroid_id int")
    with pytest.raises(Exception, match="absent from the supplied"):
        _run(
            spark, src, str(tmp_path / "err"),
            assigned=stale, time_col="ts",
        )
    kept = _run(
        spark, src, str(tmp_path / "keep"),
        assigned=stale, time_col="ts", on_unassigned="keep",
    )
    by_id = {r.vec_id: r for r in kept.collect()}
    assert by_id[2].is_survivor and by_id[2].centroid_id is None


def test_arg_validation(spark):
    df = spark.createDataFrame([], SCHEMA)
    cents = _centroids(spark)
    with pytest.raises(ValueError, match="exactly one"):
        semantic_dedup_stream(df, 0.9)
    with pytest.raises(ValueError, match="exactly one"):
        semantic_dedup_stream(df, 0.9, centroids=cents, assigned=df)
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup_stream(df, 0.0, centroids=cents)
    with pytest.raises(ValueError, match="needs time_col"):
        semantic_dedup_stream(df, 0.9, centroids=cents, watermark="1 day")
    with pytest.raises(ValueError, match="on_unassigned"):
        semantic_dedup_stream(df, 0.9, assigned=df, on_unassigned="x")
    with pytest.raises(ValueError, match="max_residents"):
        semantic_dedup_stream(df, 0.9, centroids=cents, max_residents=0)


def _residents_rows():
    """Chunks 0+1 of _rows3() as an assigned residents table (NULL-vec
    row 12 excluded — never a resident)."""
    rows = []
    for (i, v, t) in _rows3()[0] + _rows3()[1]:
        if v is None:
            continue
        cl = int(np.argmax([np.dot(v, _vec(c, "base")) for c in (0, 1, 2)]))
        rows.append((i, v, t, cl))
    return rows


def test_bootstrap_handoff_equals_one_shot(spark, tmp_path):
    """The lambda handoff: batch history -> export_semantic_residents ->
    stream continues with ZERO replay; decisions for the streamed tail
    equal the one-shot scan over the full corpus."""
    from summingbird_spark.functions.dedup import semantic_dedup
    from summingbird_spark.streaming.dedup import export_semantic_residents

    res = spark.createDataFrame(
        _residents_rows(),
        "vec_id bigint, embedding array<double>, ts timestamp, centroid_id int",
    )
    boot = str(tmp_path / "boot")
    n = export_semantic_residents(res, boot, time_col="ts")
    assert n == len(_residents_rows())

    src = _stage(spark, str(tmp_path / "src"), [_rows3()[2]])
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts", bootstrap_dir=boot,
    )
    one = semantic_dedup(
        spark.createDataFrame(_all_rows(), SCHEMA).drop("ts"),
        THRESH, k_clusters=3, centroids=_centroids(spark),
    )
    tail_ids = [r[0] for r in _rows3()[2]]
    o = {r.vec_id: r for r in one.where(F.col("vec_id").isin(tail_ids)).collect()}
    s = {r.vec_id: r for r in got.collect()}
    assert set(s) == set(tail_ids)
    for i in tail_ids:
        assert s[i].is_survivor == o[i].is_survivor, i
        assert s[i].centroid_id == o[i].centroid_id, i
        assert s[i].nearest_prior_id == o[i].nearest_prior_id, i
        if o[i].nearest_prior_sim is None:
            assert s[i].nearest_prior_sim is None, i
        else:
            assert abs(s[i].nearest_prior_sim - o[i].nearest_prior_sim) < 1e-9, i
    # non-degenerate: the tail's drops witness CARRIED-IN residents
    assert not s[20].is_survivor and s[20].nearest_prior_id == 1
    assert not s[22].is_survivor and s[22].nearest_prior_id in (0, 2, 10)


def test_bootstrap_refusals(spark, tmp_path):
    from summingbird_spark.streaming.dedup import (
        export_semantic_residents, semantic_dedup_stream,
    )

    df = spark.createDataFrame([], SCHEMA)
    cents = _centroids(spark)
    with pytest.raises(ValueError, match="does not exist"):
        semantic_dedup_stream(
            df, 0.9, centroids=cents, bootstrap_dir=str(tmp_path / "nope"))
    # a dir without a manifest refuses (partial write / wrong layout)
    bare = tmp_path / "bare"
    bare.mkdir()
    with pytest.raises(ValueError, match="no _manifest.json"):
        semantic_dedup_stream(
            df, 0.9, centroids=cents, bootstrap_dir=str(bare))
    # id-type drift refuses (min-id ordering is type-sensitive)
    res = spark.createDataFrame(
        [("a", _vec(0, "base"), _t(0), 0)],
        "vec_id string, embedding array<double>, ts timestamp, centroid_id int",
    )
    boot = str(tmp_path / "boot_str")
    export_semantic_residents(res, boot, time_col="ts")
    with pytest.raises(ValueError, match="id type"):
        semantic_dedup_stream(df, 0.9, centroids=cents, bootstrap_dir=boot)
    # NULL centroid refuses in-plan at export
    bad = spark.createDataFrame(
        [(1, _vec(0, "base"), _t(0), None)],
        "vec_id bigint, embedding array<double>, ts timestamp, centroid_id int",
    )
    with pytest.raises(Exception, match="NULL centroid_id"):
        export_semantic_residents(bad, str(tmp_path / "bad"), time_col="ts")


def test_bootstrap_evicted_seed_never_reseeds(spark, tmp_path):
    """Watermark evicts a carried-in resident; later batches must NOT
    re-load it from the export (state.exists pins the generation)."""
    from summingbird_spark.streaming.dedup import export_semantic_residents

    t0 = dt.datetime(2024, 1, 1)
    far = t0 + dt.timedelta(days=10)
    res = spark.createDataFrame(
        [(1, _vec(0, "base"), t0, 0)],
        "vec_id bigint, embedding array<double>, ts timestamp, centroid_id int",
    )
    boot = str(tmp_path / "boot")
    export_semantic_residents(res, boot, time_col="ts")
    chunks = [
        # batch 0 touches cluster 0: seeds resident 1 (ts=t0), drops 2
        [(2, _vec(0, "dup"), t0)],
        # advance the watermark past t0 via cluster 1
        [(3, _vec(1, "base"), far)],
        # dup of the seed — seed evicted, export must NOT re-seed
        [(4, _vec(0, "dup"), far)],
    ]
    src = _stage(spark, str(tmp_path / "src"), chunks)
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts", watermark="1 day",
        bootstrap_dir=boot,
    )
    by_id = {r.vec_id: r for r in got.collect()}
    assert not by_id[2].is_survivor and by_id[2].nearest_prior_id == 1
    assert by_id[4].is_survivor, "evicted seed must stay evicted"


def test_string_ids_order_lexicographically(spark, tmp_path):
    """String ids ride the object-dtype path end to end; min-id keep
    policy becomes lexicographic min, matching the batch operator."""
    schema = "vec_id string, embedding array<double>, ts timestamp"
    rows = [
        [("b", _vec(0, "base"), _t(0))],
        [("a", _vec(0, "dup"), _t(1))],   # SMALLER id arrives later:
        # seen-row mask is by id, but 'b' (seen) is LARGER than 'a' —
        # a larger-id resident never drops a new row
        [("c", _vec(0, "dup"), _t(2))],   # dropped vs 'a' or 'b'
    ]
    d = str(tmp_path / "src")
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate(rows):
        tmp = os.path.join(d, f"w{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(tmp)
        shutil.move(glob.glob(tmp + "/*.parquet")[0],
                    os.path.join(d, f"chunk{i}.parquet"))
        shutil.rmtree(tmp)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(d)
    )
    out = semantic_dedup_stream(
        stream, THRESH, centroids=_centroids(spark), time_col="ts")
    outdir = str(tmp_path / "out")
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _b: bdf.write.mode("append").parquet(outdir))
        .outputMode("update")
        .option("checkpointLocation", outdir + ".ckpt")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    by_id = {r.vec_id: r for r in spark.read.parquet(outdir).collect()}
    assert by_id["b"].is_survivor
    # 'a' arrived after 'b' but has the smaller id: the seen row 'b'
    # cannot witness a drop of 'a' (id mask, not arrival mask)
    assert by_id["a"].is_survivor
    assert not by_id["c"].is_survivor
    assert by_id["c"].nearest_prior_id in ("a", "b")


def test_same_id_rearrival_drops_as_duplicate(spark, tmp_path):
    """A replayed id meets its own resident (cosine 1.0) and drops —
    replay-safe at-least-once ingest."""
    chunks = [
        [(1, _vec(0, "base"), _t(0))],
        [(1, _vec(0, "base"), _t(1))],   # the same row again
    ]
    src = _stage(spark, str(tmp_path / "src"), chunks)
    got = _run(
        spark, src, str(tmp_path / "out"),
        centroids=_centroids(spark), time_col="ts",
    )
    rows = sorted(got.collect(), key=lambda r: r.ts)
    assert rows[0].is_survivor
    assert not rows[1].is_survivor
    assert rows[1].nearest_prior_id == 1
    assert abs(rows[1].nearest_prior_sim - 1.0) < 1e-9


def test_checkpoint_restart_recovers_residents(spark, tmp_path):
    """Stop after two micro-batches, restart the SAME checkpoint on a
    new file: resident state recovers from the state store (not from
    re-reading the stream) and the tail's decisions still equal the
    one-shot scan."""
    from summingbird_spark.functions.dedup import semantic_dedup

    cents = _centroids(spark)
    src = _stage(spark, str(tmp_path / "src"), _rows3()[:2])
    out_dir = str(tmp_path / "out")

    def go():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        out = semantic_dedup_stream(
            stream, THRESH, centroids=cents, time_col="ts")
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _b: bdf.write.mode("append").parquet(out_dir))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    go()                                   # generation 1: chunks 0-1
    n_gen1 = spark.read.parquet(out_dir).count()
    assert n_gen1 == 7
    # stage chunk 2 under a FRESH file name (file sources are
    # append-only: the checkpoint tracks processed paths)
    tmp = os.path.join(src, "w9")
    spark.createDataFrame(_rows3()[2], SCHEMA).coalesce(1).write.parquet(tmp)
    shutil.move(glob.glob(tmp + "/*.parquet")[0],
                os.path.join(src, "chunk9.parquet"))
    shutil.rmtree(tmp)
    go()                                   # generation 2: chunk 2 only
    got = spark.read.parquet(out_dir)
    assert got.count() == len(_all_rows())

    one = semantic_dedup(
        spark.createDataFrame(_all_rows(), SCHEMA).drop("ts"),
        THRESH, k_clusters=3, centroids=cents,
    )
    o = {r.vec_id: r for r in one.collect()}
    for r in got.collect():
        assert r.is_survivor == o[r.vec_id].is_survivor, r
        assert r.nearest_prior_id == o[r.vec_id].nearest_prior_id, r
    # the restarted generation really dropped vs PRE-restart residents
    by_id = {r.vec_id: r for r in got.collect()}
    assert not by_id[20].is_survivor and by_id[20].nearest_prior_id == 1


def test_null_event_time_refuses_under_watermark(spark, tmp_path):
    """A NULL event time cannot sit on a horizon: in-plan refusal names
    the row (without a watermark, NULL ts rows flow through)."""
    chunks = [[(1, _vec(0, "base"), None)]]
    src = _stage(spark, str(tmp_path / "src"), chunks)
    with pytest.raises(Exception, match="NULL ts"):
        _run(
            spark, src, str(tmp_path / "err"),
            centroids=_centroids(spark), time_col="ts", watermark="1 day",
        )
    ok = _run(
        spark, src, str(tmp_path / "ok"),
        centroids=_centroids(spark), time_col="ts",
    )
    assert ok.count() == 1 and ok.first().is_survivor


def test_read_semantic_residents_decodes_checkpoint(spark, tmp_path):
    """State observability: the checkpoint decodes to one row per
    resident (dropped docs included), with normalized vectors under
    include_vectors and a wrong-kernel refusal."""
    from summingbird_spark.streaming.state_tools import (
        read_semantic_residents,
    )

    src = _stage(spark, str(tmp_path / "src"), _rows3())
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = semantic_dedup_stream(
        stream, THRESH, centroids=_centroids(spark), time_col="ts")
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _b: bdf.write.mode("append").parquet(out_dir))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)

    res = read_semantic_residents(spark, ckpt).collect()
    # every non-NULL-vector row is a resident, dropped docs included
    expect = {r[0] for r in _all_rows() if r[1] is not None}
    assert {r.id for r in res} == expect
    by_id = {r.id: r for r in res}
    assert by_id[0].centroid_id == by_id[2].centroid_id  # same cluster
    assert all(r.ts_ms > 0 for r in res)  # ingested with time_col

    withv = read_semantic_residents(
        spark, ckpt, include_vectors=True).collect()
    v = np.asarray({r.id: r for r in withv}[0].vec)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9  # stored normalized

    # point-in-time: after batch 0 only chunk-0 residents exist
    early = read_semantic_residents(spark, ckpt, batch_id=0).collect()
    assert {r.id for r in early} == {0, 1, 2, 3}

    # a differently-keyed stateful checkpoint is refused by key-shape
    from summingbird_spark.streaming.dedup import dedup_stream

    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    dd = dedup_stream(
        stream2, key_cols=["vec_id"], time_col="ts", watermark="1 day")
    ckpt2 = str(tmp_path / "ckpt2")
    q2 = (
        # the batch fn must run an action: a pure no-op foreachBatch
        # never completes its trigger under availableNow
        dd.writeStream.foreachBatch(lambda bdf, _b: bdf.count())
        .outputMode("update")
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True).start()
    )
    assert q2.awaitTermination(180)
    with pytest.raises(ValueError, match="not a semantic_dedup_stream"):
        read_semantic_residents(spark, ckpt2)
