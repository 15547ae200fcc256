"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (default: a fixed
top-cost list). Streaming queries are skipped unless --run-streams is
passed (their returned DataFrame is a post-run parquet scan, so the
batch explain is not the plan that executed; the lint gate covers the
micro-batch plans separately).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "semantic_dedup_partitioned",
    "incremental_semantic_dedup",
    "semantic_dedup",
    "corpus_to_shards",
    "decontaminate_bloom",
    "dedup_survivors",
    "dedup_clusters",
    "remove_duplicate_spans",
    "repetition_ngrams",
    "bloom_membership",
    "embedding_lsh_topk",
    "cross_doc_repetition",
    "pmi_cooccurrence",
    "chunk_bm25_search",
    "embedding_quantized_topk",
    "decontaminate",
    "ngram_jaccard",
    "lm_quality_scores",
    "pack_shards",
    "embedding_ivf_topk",
    "pack_examples",
    "asof_latest_order",
    "table_profile_events",
    "bm25_search",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from summingbird_spark.queries import QUERIES

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(buf.getvalue())
            txt = buf.getvalue()
            n_ex = txt.count("Exchange")
            n_py = (
                txt.count("BatchEvalPython")
                + txt.count("ArrowEvalPython")
                + txt.count("MapInPandas")
                + txt.count("FlatMapGroupsInPandas")
                + txt.count("FlatMapCoGroupsInPandas")
            )
            print(f"{name}: Exchange={n_ex} PythonNodes={n_py} -> {path}")
        except Exception as e:
            print(f"error {name}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
