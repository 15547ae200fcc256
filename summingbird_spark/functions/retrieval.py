"""Full-text retrieval operators: corpus term statistics and BM25 scoring.

A training-data pipeline needs retrieval for targeted curation (pull
documents matching a probe query), decontamination audits, and
quality-by-example mining. This module implements the classic
inverted-index statistics relationally — no index service, just
DataFrames — so the same job scales from a laptop to a 1000-executor
cluster:

* ``term_stats``   — per-term document frequency over the corpus;
* ``corpus_stats`` — N (doc count) and avgdl (mean token count);
* ``bm25_scores``  — Robertson/Sparck-Jones BM25 (the Lucene variant)
  of every document against a fixed bag of query terms;
* ``bm25_topk``    — global top-k by score.

Scale design (100 TB corpus, O(10) query terms):

* the token explode is filtered to the query terms *before* any shuffle
  (``isin`` is a codegen predicate on the exploded column), so the only
  data that moves is (doc_id, matched term) pairs — a vanishingly small
  slice of the corpus;
* per-(doc, term) tf uses Catalyst's map-side partial aggregation;
* document frequency and the (N, avgdl) scalars aggregate to a
  vocabulary-of-the-query-sized table and a single row, both joined back
  with broadcast hints — the corpus-sized side never reshuffles;
* the final top-k is ``orderBy(...).limit(k)`` which Spark executes as
  TakeOrdered (per-partition heaps + driver merge), not a global sort.

Determinism: scores are rounded and ties broken by doc id, so the same
corpus always yields the same top-k set — required for the DuckDB oracle
hash gate and for reproducible curation runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count, tokenize


def corpus_stats(docs: DataFrame, text_col: str) -> DataFrame:
    """One row: ``n_docs`` and ``avgdl`` (mean token count per doc)."""
    return docs.select(token_count(F.lower(F.col(text_col))).alias("__dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("__dl").alias("avgdl"),
    )


def term_stats(
    docs: DataFrame, id_col: str, text_col: str, terms: list[str] | None = None
) -> DataFrame:
    """Document frequency per term: ``(term, df)``.

    With ``terms`` given, the explode is pre-filtered to those terms so
    nothing else shuffles; without it this is the full corpus vocabulary
    (still fine — (term, partial count) pairs after map-side distinct).
    """
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    )
    if terms is not None:
        tok = tok.where(F.col("term").isin(list(terms)))
    return (
        tok.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 4,
) -> DataFrame:
    """BM25 score of every document matching >= 1 query term.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with the Lucene/Robertson idf  ln(1 + (N - df + 0.5) / (df + 0.5)).

    Returns ``(id_col, score)`` — only matching documents appear (a
    non-matching doc scores 0 and is uninteresting at corpus scale).
    """
    terms = list(terms)
    toks = docs.select(
        F.col(id_col).alias(id_col),
        token_count(F.lower(F.col(text_col))).alias("__dl"),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"),
    ).where(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("__dl").cast("double").alias("dl"),
    )
    dfreq = term_stats(docs, id_col, text_col, terms)
    stats = corpus_stats(docs, text_col)
    n, dfc = F.col("n_docs").cast("double"), F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfc + 0.5) / (dfc + 0.5))
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), ndigits).alias("score"))
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 4,
) -> DataFrame:
    """Global top-k documents by BM25 score (ties -> lowest id wins);
    executed as TakeOrdered, not a global sort."""
    scored = bm25_scores(docs, id_col, text_col, terms, k1, b, ndigits)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
