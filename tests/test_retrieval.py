"""BM25 retrieval: semantics vs a naive Python reference, determinism,
and plan shape (query-term filter before the shuffle, broadcast stats)."""

import math

from pyspark.sql import functions as F

from summingbird_spark.functions.retrieval import (
    bm25_scores,
    bm25_topk,
    corpus_stats,
    term_stats,
)

DOCS = [
    (1, "spark shuffles the hash join"),
    (2, "merge sort merge join window"),
    (3, "the quick brown fox"),
    (4, "hash hash hash spark"),
    (5, ""),
]
TERMS = ["spark", "merge", "hash"]


def naive_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: [w for w in t.lower().split(" ") if w] for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_naive_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, "doc_id", "text", TERMS).collect()}
    want = naive_bm25(DOCS, TERMS)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_bm25_topk_order_and_ties(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(df, "doc_id", "text", TERMS, k=2).collect()
    want = sorted(naive_bm25(DOCS, TERMS).items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc_id"], r["score"]) for r in top] == want


def test_corpus_and_term_stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    row = corpus_stats(df, "text").collect()[0]
    assert row["n_docs"] == 5
    assert abs(row["avgdl"] - (5 + 5 + 4 + 4 + 0) / 5) < 1e-12
    dfreq = {r["term"]: r["df"] for r in term_stats(df, "doc_id", "text", TERMS).collect()}
    assert dfreq == {"spark": 2, "merge": 1, "hash": 2}


def test_bm25_plan_filters_before_shuffle_and_broadcasts(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = bm25_topk(df, "doc_id", "text", TERMS, k=10)._jdf.queryExecution().executedPlan().toString()
    # the df / corpus-stats sides join in without reshuffling the tf side
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # top-k is TakeOrdered, not a global Sort+Exchange
    assert "TakeOrderedAndProject" in plan
