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

from ..core.materialize import materialize as _materialize
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
    symbols = initial_symbols(word_freqs(df, text_col)).transform(_materialize)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = top_pair(symbols)
        if best is None or best[2] < 2:
            break
        a, b, _ = best
        merges.append((a, b))
        symbols = apply_merge(symbols, a, b).transform(_materialize)
    return merges, symbols


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str | None = None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus — the encode side of the
    tokenizer. Returns the input plus ``out_col`` (array of sub-word
    symbols, `</w>`-terminated per word).

    The corpus-scale trick mirrors training: encoding is a pure function
    of the WORD, so the distinct-word table (vocab-sized) is encoded once
    by a pandas UDF applying the merges in training order, broadcast, and
    joined back onto the exploded token stream — the corpus itself never
    runs Python. Per-doc sub-token arrays reassemble in token order.
    """
    import pandas as pd

    from .text import tokenize

    key = id_col if id_col is not None else "__rid__"
    if id_col is not None:
        src = df
    else:
        # synthesized row ids are position-dependent and the frame is
        # referenced from two subtrees (token explode + final join):
        # localCheckpoint (eager) PINS one evaluation by cutting lineage —
        # unlike cache(), a lost block fails the job instead of silently
        # recomputing different ids and mis-joining tokens back to rows
        # (ADVICE r5); blocks free with the DataFrame via the context
        # cleaner. Prefer passing a real id_col at scale.
        src = df.withColumn("__rid__", F.monotonically_increasing_id()).transform(_materialize)
    toks = src.select(
        F.col(key).alias(key),
        F.posexplode(tokenize(F.lower(F.col(text_col)))).alias("__p__", "__w__"),
    )
    vocab = toks.select(F.col("__w__")).distinct()

    merges_l = [tuple(m) for m in merges]

    def encode_words(batches):
        for pdf in batches:
            def enc(w):
                syms = list(w) + ["</w>"]
                for a, b in merges_l:
                    out, i, m = [], 0, a + b
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                            out.append(m)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                return syms

            yield pd.DataFrame({"__w__": pdf["__w__"], "__enc__": pdf["__w__"].map(enc)})

    encoded = vocab.mapInPandas(encode_words, "__w__ string, __enc__ array<string>")
    per_doc = (
        toks.join(F.broadcast(encoded), "__w__")
        .groupBy(key)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__p__"), F.col("__enc__")))
                    ),
                    lambda s: s["__enc__"],
                )
            ).alias(out_col)
        )
    )
    out = src.join(per_doc, key, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )
    return out.drop("__rid__") if id_col is None else out
