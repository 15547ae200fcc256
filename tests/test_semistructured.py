"""JSON column operators: typed parse, corrupt-record capture, nested
fields, array explode."""

from summingbird_spark.functions.semistructured import (
    _split_ddl,
    explode_json_array,
    with_json_fields,
)


def test_split_ddl_respects_nesting():
    assert _split_ddl("k BIGINT, tags ARRAY<STRING>, m MAP<STRING,BIGINT>") == [
        "k BIGINT",
        "tags ARRAY<STRING>",
        "m MAP<STRING,BIGINT>",
    ]


def test_with_json_fields_and_corrupt_capture(spark):
    rows = [
        (1, '{"k": 7, "tags": ["a", "b"]}'),
        (2, '{"k": null}'),
        (3, "not json at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    out = with_json_fields(df, "props", "k BIGINT, tags ARRAY<STRING>")
    got = {r["id"]: (r["k"], r["tags"], r["_corrupt"]) for r in out.collect()}
    assert got[1] == (7, ["a", "b"], None)
    assert got[2] == (None, None, None)          # valid JSON, null field
    assert got[3] == (None, None, "not json at all")  # captured, not dropped
    assert got[4] == (None, None, None)          # NULL input stays NULL


def test_explode_json_array(spark):
    rows = [
        (1, '[{"x": 1}, {"x": 2}]'),
        (2, "[]"),
        (3, "broken"),
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    out = explode_json_array(df, "payload", "x BIGINT")
    got = sorted((r["id"], r["elem"]["x"]) for r in out.collect())
    assert got == [(1, 1), (1, 2)]  # empty + broken arrays contribute no rows


def test_json_extract_streaming_parity(spark, tmp_path):
    """The JSON parse path is streaming-safe: from_json + extract + summer
    over micro-batches equals the batch answer (corrupt rows included)."""
    import datetime as dt
    import glob
    import shutil

    import summingbird_spark as sb
    from pyspark.sql import functions as F
    from summingbird_spark import source, to_dataframe
    from summingbird_spark.functions.semistructured import parse_json
    from summingbird_spark.streaming.planner import StreamPlanner, stream_source
    from summingbird_spark.streaming.store import OnlineStore, run_summer_to_store

    def ts(i):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)

    rows = [
        (ts(i), f"u{i % 3}", '{"k": %d}' % i if i % 5 else "broken json")
        for i in range(60)
    ]
    schema = "ts timestamp, user string, props string"
    d = tmp_path / "src"
    d.mkdir()
    for i, chunk in enumerate([rows[:30], rows[30:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
        for f in glob.glob(str(d / f"c{i}" / "*.parquet")):
            shutil.move(f, str(d / f"chunk{i}.parquet"))
        shutil.rmtree(str(d / f"c{i}"))

    def pipeline(src):
        # parsed-k sum per user; corrupt payloads contribute 0 (and are
        # observable via the corrupt column — the quarantine metric)
        parsed = parse_json(F.col("props"), "k BIGINT")
        return src.map(
            value=F.coalesce(parsed["k"], F.lit(0))
        ).sum_by_key("user", "value", semigroup="sum_long", batcher=sb.of_days(1))

    batch_df = spark.read.schema(schema).parquet(str(d))
    p_batch = pipeline(source(batch_df, time_col="ts"))
    want = {
        (r.user, r.batch_id): r.delta
        for r in to_dataframe(spark, p_batch).collect()
    }

    src = stream_source(str(d), schema, time_col="ts", max_files_per_trigger=1)
    plan = StreamPlanner(spark).plan(pipeline(src))
    store = OnlineStore(str(tmp_path / "online"), ["user"], "sum_long")
    q = run_summer_to_store(plan.dataframe, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {(r.user, r.batch_id): r.value for r in store.read(spark).collect()}
    assert got == want and len(got) == 9  # 3 users x 3 day-batches


def test_streaming_corpus_ingest_parity(spark, tmp_path):
    """The ingest-side corpus verbs (quality gate, PII scrub, RAG
    chunking) are pure column transforms — the same code runs unchanged
    on a readStream DataFrame, and its output equals the batch run."""
    import glob
    import shutil

    from pyspark.sql import functions as F
    from summingbird_spark.functions.packing import chunk_documents
    from summingbird_spark.functions.text import scrub_pii, token_count

    rows = [
        (
            i,
            ("reach me at u%d@example.com " % i) + "tok " * (5 + i % 20),
        )
        for i in range(40)
    ]
    schema = "doc_id long, text string"
    d = tmp_path / "docs"
    d.mkdir()
    for i, chunk in enumerate([rows[:20], rows[20:]]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
        for f in glob.glob(str(d / f"c{i}" / "*.parquet")):
            shutil.move(f, str(d / f"chunk{i}.parquet"))
        shutil.rmtree(str(d / f"c{i}"))

    def transform(df):
        cleaned = df.where(token_count(F.col("text")) >= 10).select(
            "doc_id", scrub_pii(F.col("text")).alias("text")
        )
        return chunk_documents(cleaned, "doc_id", "text", chunk_tokens=8)

    want = sorted(
        tuple(r) for r in transform(spark.read.schema(schema).parquet(str(d))).collect()
    )
    # chunker lowercases its token stream, so the scrub placeholder
    # surfaces as <email>
    assert want and all("<email>" in r[2] for r in want if r[1] == 0)

    q = (
        transform(spark.readStream.schema(schema).parquet(str(d)))
        .writeStream.format("memory")
        .queryName("ingest_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ingest_stream").collect()
    )
    assert got == want
