"""Targeted curation + retrieval — the round-5 additions composed into
one runnable pipeline, from the same library surface a user gets:

  1. profile the raw table (one-pass data-quality stats)
  2. per-source quality percentile gate (top half of each domain)
  3. cross-document repetition filter (Lee-et-al duplicated-span signal)
  4. temperature mixture (p ∝ n^0.5 — up-weight small sources)
  5. BM25 probe retrieval over the survivors (curation-by-example)
  6. weighted sample (∝ length) → curriculum deciles
  7. BPE tokenizer learned on the final mix

Run:
    python examples/curation_and_retrieval.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str):
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("curation-and-retrieval")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.window import Window

    from summingbird_spark.functions import text as T
    from summingbird_spark.functions.bpe import bpe_learn
    from summingbird_spark.functions.dedup import cross_doc_repetition
    from summingbird_spark.functions.profile import table_profile
    from summingbird_spark.functions.retrieval import bm25_topk
    from summingbird_spark.functions.sampling import (
        temperature_mixture,
        weighted_sample,
    )
    from summingbird_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    print("== 1. profile ==")
    table_profile(docs, ["doc_id", "source", "lang", "n_chars"]).show()

    print("== 2. per-source quality gate (keep top half) ==")
    scored = docs.select(
        "doc_id", "source", "text", T.quality_score(F.col("text")).alias("q")
    )
    w = Window.partitionBy("source").orderBy("q", "doc_id")
    gated = (
        scored.withColumn("pctl", F.percent_rank().over(w))
        .where(F.col("pctl") >= 0.5)
        .drop("pctl")
    )
    print("kept:", gated.count(), "of", docs.count())

    print("== 3. cross-doc repetition filter ==")
    rep = cross_doc_repetition(docs, "doc_id", "text", shingle_n=3)
    clean = gated.join(
        rep.where(F.col("dup_gram_frac") <= 0.95).select("doc_id"), "doc_id"
    )
    print("after repetition filter:", clean.count())

    print("== 4. temperature mixture (alpha=0.5) ==")
    mixed = temperature_mixture(clean, "source", "doc_id", alpha=0.5)
    mixed.groupBy("source").count().orderBy("source").show(5)

    print("== 5. BM25 probe over the survivors ==")
    bm25_topk(mixed, "doc_id", "text", ["spark", "merge", "window"], k=5).show()

    print("== 6. length-weighted sample -> curriculum deciles ==")
    sample = weighted_sample(
        mixed.withColumn("n_tok", T.token_count(F.col("text"))),
        100, "n_tok", "doc_id", seed=1,
    )
    w2 = Window.orderBy("n_tok", "doc_id")
    sample.withColumn("decile", F.ntile(10).over(w2)).groupBy("decile").agg(
        F.avg("n_tok").alias("avg_tokens")
    ).orderBy("decile").show(10)

    print("== 7. BPE on the final mix ==")
    merges, _ = bpe_learn(sample, "text", n_merges=5)
    print("first merges:", merges)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
