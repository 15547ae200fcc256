"""Text-analysis operators for large-scale training-data pipelines.

These are the Spark-native extensions beyond the reference's surface
(SURVEY §7 phase 6): tokenization, token statistics, quality scoring,
language-ID heuristic, and document fingerprints — all pure Column
expressions (JVM-side, whole-stage-codegen; no Python UDFs), so they run
at scan speed on 100 TB inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic; deliberately minimal + deterministic (no external models).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "una", "que"],
}


def tokenize(text: Column, pattern: str = " ") -> Column:
    """Whitespace tokenization; empty tokens dropped."""
    return F.filter(F.split(text, pattern), lambda t: t != F.lit(""))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish sub-word split: words plus punctuation as separate tokens
    (regex word-boundary split; a deterministic stand-in for a real BPE)."""
    return F.filter(
        F.split(F.regexp_replace(text, r"([^\w\s])", r" $1 "), r"\s+"),
        lambda t: t != F.lit(""),
    )


def token_count(text: Column) -> Column:
    return F.size(tokenize(text)).cast("long")


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokenize(text))).cast("long")


def stopword_ratio(text: Column, lang: str = "en", ndigits: int = 4) -> Column:
    toks = tokenize(F.lower(text))
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.round(n_stop / F.greatest(F.size(toks), F.lit(1)), ndigits)


def mean_token_length(text: Column, ndigits: int = 4) -> Column:
    toks = tokenize(text)
    total = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), ndigits)


def repetition_ratio(text: Column, ndigits: int = 4) -> Column:
    """1 - unique/total tokens: high ⇒ boilerplate/spammy repetition."""
    toks = tokenize(text)
    return F.round(
        1 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
        ndigits,
    )


def quality_score(text: Column, ndigits: int = 4) -> Column:
    """Composite [0,1] quality heuristic: length band + low repetition +
    reasonable mean token length. Deterministic, model-free."""
    toks = tokenize(text)
    n = F.size(toks)
    len_ok = F.when((n >= 10) & (n <= 10_000), F.lit(1.0)).otherwise(F.lit(0.0))
    uniq = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    mean_len = F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / F.greatest(
        n, F.lit(1)
    )
    len_band = F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return F.round((len_ok + uniq + len_band) / 3.0, ndigits)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID. Returns the language with the highest
    stopword hit count, 'und' if no hits."""
    toks = tokenize(F.lower(text))
    scores = []
    for lang, words in STOPWORDS.items():
        stops = F.array(*[F.lit(s) for s in words])
        n = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        scores.append(F.struct(n.alias("n"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """64-bit-ish deterministic document fingerprint: xxhash64 of the
    normalized token stream (rolling-hash analog, portable)."""
    return F.xxhash64(F.array_join(tokenize(F.lower(text)), " "))


def md5_fingerprint(text: Column) -> Column:
    """Portable fingerprint shared with SQL oracles (DuckDB md5)."""
    return F.md5(F.array_join(tokenize(F.lower(text)), " "))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (for MinHash / Jaccard dedup). Documents with
    fewer than n tokens yield an empty array (guarded: Spark's sequence(1,0)
    would otherwise generate a *descending* [1,0] index list)."""
    toks = tokenize(F.lower(text))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
