"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a sub-word vocabulary is a corpus-scale job with a tiny
synchronization point: each merge step needs the single most frequent
adjacent symbol pair. The classic formulation fits Spark exactly:

1. collapse the corpus to a WORD-FREQUENCY table once (the only
   corpus-sized shuffle; every later step works on the vocabulary, which
   is ~10^5-10^6 rows no matter how big the corpus is);
2. per step: count adjacent symbol pairs weighted by word frequency
   (map-side partial agg over the vocab table), take the argmax
   (TakeOrdered of ONE row — the per-step driver sync, same shape as any
   iterative MLlib algorithm), and apply the merge to the symbol arrays.

The merge application is a pandas UDF — deliberate: it runs over the
VOCABULARY table, not the corpus, so Python cost is bounded by vocab
size, and left-to-right greedy merge semantics (the part BPE
implementations get subtly wrong) stay readable. The corpus itself is
touched exactly once.

Ties in pair frequency break lexicographically (a, b) so the learned
merge sequence is a deterministic function of the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokenize


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-sized aggregation."""
    return (
        df.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def initial_symbols(vocab: DataFrame) -> DataFrame:
    """Start state: each word as its character array + end-of-word marker
    (the `</w>` sentinel keeps merges from crossing word boundaries when
    the vocabulary is re-applied to text)."""
    chars = F.split(F.col("word"), "")
    return vocab.select(
        "word",
        "freq",
        F.concat(chars, F.array(F.lit("</w>"))).alias("symbols"),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies, weighted by word frequency: the BPE
    step statistic. Pairs are zipped inside the row (no join) and the
    aggregation partial-aggregates map-side."""
    s, n = F.col("symbols"), F.size("symbols")
    pairs = symbols.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(s, 1, n - 1).alias("a"), F.slice(s, 2, n - 1).alias("b")
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").cast("long").alias("cnt"))


def top_pair(symbols: DataFrame) -> tuple[str, str, int] | None:
    """The next merge: most frequent pair, ties to lexicographic (a, b).
    One-row TakeOrdered — the step's only driver synchronization."""
    rows = (
        pair_counts(symbols)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    r = rows[0]
    return (r["a"], r["b"], r["cnt"])


def apply_merge(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every left-to-right adjacent (a, b) with the merged symbol
    a+b. Pandas UDF over the vocab table (bounded rows; greedy scan
    semantics explicit)."""
    out_schema = "word string, freq long, symbols array<string>"

    def merge_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged = a + b
        for pdf in it:
            def merge_one(syms):
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                return out

            pdf = pdf.copy()
            pdf["symbols"] = pdf["symbols"].map(merge_one)
            yield pdf

    return symbols.mapInPandas(merge_batch, out_schema)


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    spark: SparkSession | None = None,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merge list, final symbol
    table). The symbol table is localCheckpointed each step to keep the
    lineage flat (an iterative plan would otherwise stack K mapInPandas
    stages deep)."""
    symbols = initial_symbols(word_freqs(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = top_pair(symbols)
        if best is None or best[2] < 2:
            break
        a, b, _ = best
        merges.append((a, b))
        symbols = apply_merge(symbols, a, b).localCheckpoint()
    return merges, symbols
