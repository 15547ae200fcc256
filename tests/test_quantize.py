"""int8 embedding quantization: range, zero-vector guard, reconstruction."""

import math

from pyspark.sql import Row

from summingbird_spark.functions.similarity import quantize_embeddings


def _q(spark, vecs):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    return {r.vec_id: r for r in quantize_embeddings(df).collect()}


def test_quantize_range_and_extremes(spark):
    out = _q(spark, [[1.0, -1.0, 0.5, 0.0], [0.25, 0.125, -0.0625, 0.0]])
    r = out[0]
    assert r.scale == 1.0
    assert r.q == [127, -127, 64, 0]  # floor(0.5*127+0.5)=floor(64.0)=64
    r2 = out[1]
    assert r2.scale == 0.25
    # -0.0625/0.25*127 = -31.75; floor(-31.75 + 0.5) = -32
    assert r2.q == [127, 64, -32, 0]
    assert all(-127 <= x <= 127 for r in out.values() for x in r.q)


def test_quantize_zero_vector_is_zeros(spark):
    out = _q(spark, [[0.0, 0.0, 0.0]])
    assert out[0].scale == 0.0
    assert out[0].q == [0, 0, 0]


def test_quantize_reconstruction_error_bound(spark):
    vecs = [[math.sin(i * j + 1) for j in range(16)] for i in range(20)]
    out = _q(spark, vecs)
    for i, v in enumerate(vecs):
        s = out[i].scale
        for orig, qv in zip(v, out[i].q):
            # dequantized value within half a quantization step (float32
            # input representation adds < 1e-6 on |v| <= 1)
            assert abs(qv * s / 127.0 - orig) <= s / 127.0 / 2 + 1e-5


def test_quantized_topk_recall_vs_exact(spark):
    from summingbird_spark.functions.similarity import (
        brute_force_topk,
        quantized_topk,
    )
    from summingbird_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where("vec_id < 5")
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
    quant = quantized_topk(emb, queries, "vec_id", "embedding", k=5, oversample=4)
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}
    got = {(r.query_id, r.vec_id) for r in quant.collect()}
    recall = len(truth & got) / len(truth)
    # 64-dim int8 keeps ~all neighbors; the bound leaves room for ties
    assert recall >= 0.9, recall


def test_quantize_streaming_batch_parity(spark, tmp_path):
    """The Arrow quantization kernel is a stateless mapInPandas, so it
    runs unchanged over a streaming ingest and emits the identical
    (scale, q) rows — quantize-at-the-door works in both modes."""
    import math as _m

    rows = [
        (i, [float(_m.sin(i * j + 1)) for j in range(8)]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src = str(tmp_path / "emb_src")
    df.coalesce(2).write.parquet(src)

    batch = {
        (r.vec_id, r.scale, tuple(r.q))
        for r in quantize_embeddings(spark.read.parquet(src)).collect()
    }
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(src)
    q = (
        quantize_embeddings(stream)
        .writeStream.format("memory")
        .queryName("quant_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.vec_id, r.scale, tuple(r.q))
        for r in spark.sql("SELECT * FROM quant_stream").collect()
    }
    assert got == batch


def test_quantize_null_embedding_null_propagates(spark):
    """A NULL embedding (corrupt corpus row) must null-propagate like a
    SQL expression — scale/q NULL, id retained — not crash the task
    (np.asarray(None) did, r12). The quantized top-k scorer skips such
    rows instead of dying on them."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, [1.0, -1.0]), (1, None), (2, [0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[1].scale is None and out[1].q is None
    assert out[0].q == [127, -127] and out[2].q == [127, 64]

    # scorer consumes the quantized table incl. the NULL row — skips it
    from summingbird_spark.functions.similarity import quantized_topk

    queries = spark.createDataFrame(
        [(100, [1.0, -0.9])], "vec_id long, embedding array<float>"
    )
    got = quantized_topk(df, queries, k=2).collect()
    ids = {r.vec_id for r in got}
    assert 1 not in ids and len(got) == 2

    # a query with a NULL embedding yields no rows (and no crash)
    nullq = spark.createDataFrame(
        [(200, None)], "vec_id long, embedding array<float>"
    )
    assert quantized_topk(df, nullq, k=2).count() == 0
