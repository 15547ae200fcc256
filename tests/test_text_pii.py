"""Unit contracts for the n-gram repetition signals and PII scrubbing."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from summingbird_spark.functions import text as T


def _signals(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    [r] = T.ngram_repetition(df, "doc_id", "text").collect()
    return r


def test_ngram_repetition_pathological_doc(spark):
    # "a a a a": bigram 'a a' x3 (top frac 1.0), trigram 'a a a' x2 (dup 1.0)
    r = _signals(spark, "a a a a")
    assert r.n_tokens == 4
    assert r.dup_token_frac == 0.75
    assert r.top_bigram_frac == 1.0
    assert r.dup_trigram_frac == 1.0


def test_ngram_repetition_all_unique(spark):
    r = _signals(spark, "one two three four")
    assert r.dup_token_frac == 0.0
    assert r.top_bigram_frac == round(1 / 3, 4)  # every bigram unique
    assert r.dup_trigram_frac == 0.0


def test_ngram_repetition_short_docs_are_zero_not_null(spark):
    for text in ("", "solo", "just two"):
        r = _signals(spark, text)
        assert r.dup_trigram_frac == 0.0
        # a 2-token doc has one bigram => top frac 1.0; shorter: 0.0
        assert r.top_bigram_frac in (0.0, 1.0)


def _scrub(spark, text):
    df = spark.createDataFrame([Row(text=text)])
    return df.select(
        T.scrub_pii(F.col("text")).alias("s"),
        T.pii_count(F.col("text"), "email").alias("e"),
        T.pii_count(F.col("text"), "phone").alias("p"),
        T.pii_count(F.col("text"), "ipv4").alias("i"),
    ).first()


def test_scrub_pii_all_kinds(spark):
    r = _scrub(spark, "mail a.b+c@test.org, call 555-867-5309, host 10.0.0.1")
    assert r.s == "mail <EMAIL>, call <PHONE>, host <IP>"
    assert (r.e, r.p, r.i) == (1, 1, 1)


def test_scrub_pii_email_domain_not_rescanned_as_ip(spark):
    # the email is replaced FIRST, so its dotted domain can't half-match
    # the ipv4/phone patterns afterwards
    r = _scrub(spark, "x@sub.domain.example.com done")
    assert r.s == "<EMAIL> done"


def test_scrub_pii_ip_before_phone_order(spark):
    # dotted quads must become <IP>, never partially <PHONE>
    r = _scrub(spark, "ping 192.168.100.200 now")
    assert r.s == "ping <IP> now"
    assert r.i == 1 and r.p == 0


def test_scrub_pii_streaming_batch_parity(spark, tmp_path):
    """scrub_pii / pii_count are stateless codegen exprs, so a streaming
    ingest pipeline scrubs identically to batch — redaction at the door
    composes with either execution mode."""
    rows = [
        (i, f"doc {i} mail u{i}@x{i}.org ip 10.0.0.{i % 256} tel 555-867-5309")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "pii_src")
    df.coalesce(2).write.parquet(src)

    def scrubbed(d):
        return d.select(
            "doc_id",
            T.scrub_pii(F.col("text")).alias("s"),
            T.pii_count(F.col("text"), "email").alias("e"),
        )

    batch = {tuple(r) for r in scrubbed(spark.read.parquet(src)).collect()}
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        scrubbed(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM pii_stream").collect()}
    assert got == batch
    assert all(e == 1 and "<EMAIL>" in s and "<IP>" in s and "<PHONE>" in s
               for _, s, e in batch)
