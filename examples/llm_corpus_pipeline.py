"""End-to-end training-corpus preparation pipeline — the LLM-data shape
this engine exists for, composed from the library surface a user gets:

  1. text quality gates (codegen expressions — scan-speed at 100 TB)
  2. exact dedup (16-byte digest shuffle)
  3. MinHash+LSH near-dup candidates → exact Jaccard verify → drop dups
  4. language filter
  5. semantic dedup (SemDeDup: cluster-scoped embedding near-dups,
     reusing the IVF index's coarse quantization — subquadratic)
  6. IVF ANN index build over the survivors' embeddings (persisted,
     centroid-partitioned)
  7. batch prep: reproducible shuffle → fixed-length causal-LM example
     packing (distributed prefix sum, documents split across example
     boundaries)
  8. a plan scale-lint gate over the final composition — the same
     check the engine's own test suite runs on every registered query

Run:
    python examples/llm_corpus_pipeline.py [sf_dir] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, out_dir: str):
    from summingbird_spark import assert_scalable
    from summingbird_spark.functions import text as T
    from summingbird_spark.functions.dedup import (
        exact_dedup, minhash_candidates, ngram_jaccard_pairs, semantic_dedup,
    )
    from summingbird_spark.functions.packing import (
        deterministic_shuffle, pack_examples,
    )
    from summingbird_spark.functions.similarity import ensure_ivf_index
    from summingbird_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gates — pure Column expressions, pushed to the scan
    scored = docs.select(
        "doc_id", "text",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
        T.lang_id(F.col("text")).alias("lang"),
    )
    kept = scored.where((F.col("n_tokens") >= 5) & (F.col("quality") >= 0.5))

    # 2. exact dedup: one survivor per distinct content
    survivors = exact_dedup(kept.select("doc_id", "text"), "text", "doc_id")
    kept = kept.join(survivors.select("doc_id"), "doc_id", "left_semi")

    # 3. near-dup sweep: LSH candidates, exact verify, drop the younger doc
    cand = minhash_candidates(kept, "doc_id", "text", num_perm=8, bands=4,
                              shingle_n=3)
    dups = ngram_jaccard_pairs(kept, cand, "doc_id", "text", shingle_n=3,
                               threshold=0.8)
    kept = kept.join(
        dups.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id", "left_anti",
    )

    # 4. language filter
    kept = kept.where(F.col("lang") != "und")

    # 6. similarity index over the corpus embeddings (also provides the
    # coarse quantization step 5 reuses — one clustering, two consumers)
    centroids, assigned = ensure_ivf_index(spark, sf_dir, k=16, n_iter=3,
                                           sample_fraction=0.2)

    # 5. semantic dedup (SemDeDup): drop docs whose embedding has an
    # earlier same-cluster neighbor at cosine >= 0.95 — cluster-scoped,
    # so pairwise work is ~n^2/k, not the exact sweep's n^2
    emb = load_table(spark, sf_dir, "embeddings")
    sd = semantic_dedup(emb, threshold=0.95, k_clusters=16,
                        assigned=assigned)
    kept = kept.join(
        sd.where(~F.col("is_survivor"))
          .select(F.col("vec_id").alias("doc_id")),
        "doc_id", "left_anti",
    )

    kept.select("doc_id", "n_tokens", "quality", "lang").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/corpus")
    corpus = spark.read.parquet(f"{out_dir}/corpus")

    # 7. batch prep: reproducible epoch order, then cut the EOS-joined
    # token stream into fixed-length training examples (documents split
    # across boundaries; the segment table is what the trainer reads)
    shuffled = deterministic_shuffle(corpus, "doc_id", seed=0,
                                     position_col="pos")
    segments = pack_examples(shuffled, "pos", "n_tokens",
                             context_len=256, eos=1)
    # 8. gate the composition on the engine's plan-scale invariants
    assert_scalable(segments)
    segments.write.mode("overwrite").parquet(f"{out_dir}/examples")

    return corpus, centroids, assigned


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/summingbird_llm_corpus"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus, centroids, assigned = build_corpus(spark, sf, out)
    n = corpus.count()
    segs = spark.read.parquet(f"{out}/examples")
    n_ex = segs.select("example_id").distinct().count()
    print(f"corpus: {n} docs; index: {centroids.count()} lists, "
          f"{assigned.count()} assigned; packed into {n_ex} "
          f"256-token examples ({segs.count()} segments)")
    spark.stop()
