"""Text-analysis operators for large-scale training-data pipelines.

These are the Spark-native extensions beyond the reference's surface
(SURVEY §7 phase 6): tokenization, token statistics, quality scoring,
language-ID heuristic, and document fingerprints.

Scale note (the round-2 lesson): higher-order-function lambdas
(``F.filter``/``F.aggregate``/``F.transform``) compile to *interpreted*
``ArrayFilter``/``ArrayAggregate`` expressions that fall out of
whole-stage codegen and run ~0.1-1 MB/s/core. Everything here is instead
expressed with codegen-able string/regexp primitives:

* token counts      -> ``size(split(trim(text), ' +'))``
* stopword counts   -> ``regexp_count`` over a space-doubled padded string
* mean token length -> ``length(translate(text, ' ', '')) / n_tokens``
* fingerprints      -> hash of ``trim(regexp_replace(text, ' +', ' '))``

The only remaining HOF is ``shingles`` (word n-grams need an array
``transform``); its consumers (MinHash/Jaccard) immediately explode, so
the lambda touches each shingle once and the cost is dominated by
hashing, not interpretation.

Token semantics (shared with every DuckDB oracle): a token is a maximal
run of non-space characters after ``lower()``; splitting is on the space
character only (tabs/newlines stay inside tokens), empties dropped.
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
    """Tokens as an array; empty tokens dropped.

    For the default single-space pattern this is pure codegen:
    ``split(trim(text), ' +')`` (split on space *runs* after trimming) is
    exactly "split on space, drop empties" without an interpreted
    ``ArrayFilter`` pass. Non-space patterns keep the general HOF path.
    """
    if pattern == " ":
        t = F.trim(text)
        return F.when(t == "", F.array().cast("array<string>")).otherwise(
            F.split(t, " +")
        )
    return F.filter(F.split(text, pattern), lambda tok: tok != F.lit(""))


def normalized_text(text: Column) -> Column:
    """``array_join(tokenize(lower(text)), ' ')`` as one codegen expr:
    lower-case, collapse space runs, trim."""
    return F.trim(F.regexp_replace(F.lower(text), " +", " "))


def _padded(text: Column) -> Column:
    """Every token surrounded by its own private spaces: double each
    space, then pad both ends. Lets ``regexp_count(padded, ' (w1|w2) ')``
    count whole-token matches without adjacent matches stealing the
    shared separator (regexp_count is non-overlapping)."""
    return F.concat(F.lit(" "), F.regexp_replace(text, " ", "  "), F.lit(" "))


def _word_count(padded: Column, words: list[str]) -> Column:
    pat = " (" + "|".join(words) + ") "
    return F.regexp_count(padded, F.lit(pat))


def token_count(text: Column) -> Column:
    t = F.trim(text)
    return (
        F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " +"))).cast("long")
    )


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokenize(text))).cast("long")


def stopword_ratio(text: Column, lang: str = "en", ndigits: int = 4) -> Column:
    n_stop = _word_count(_padded(F.lower(text)), STOPWORDS[lang])
    return F.round(n_stop / F.greatest(token_count(text), F.lit(1)), ndigits)


def mean_token_length(text: Column, ndigits: int = 4) -> Column:
    # sum(len(token)) == count of non-space chars == len(translate(text,' ',''))
    total = F.length(F.translate(text, " ", "")).cast("double")
    return F.round(total / F.greatest(token_count(text), F.lit(1)), ndigits)


def repetition_ratio(text: Column, ndigits: int = 4) -> Column:
    """1 - unique/total tokens: high => boilerplate/spammy repetition."""
    n = token_count(text)
    return F.round(
        1 - unique_token_count(text) / F.greatest(n, F.lit(1)), ndigits
    )


def quality_score(text: Column, ndigits: int = 4) -> Column:
    """Composite [0,1] quality heuristic: length band + low repetition +
    reasonable mean token length. Deterministic, model-free."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 10_000), F.lit(1.0)).otherwise(F.lit(0.0))
    uniq = unique_token_count(text) / F.greatest(n, F.lit(1))
    mean_len = F.length(F.translate(text, " ", "")).cast("double") / F.greatest(
        n, F.lit(1)
    )
    len_band = F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return F.round((len_ok + uniq + len_band) / 3.0, ndigits)


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID. Returns the language with the highest
    stopword hit count ('und' if no hits; ties break to the
    lexicographically largest language code, matching greatest())."""
    padded = _padded(F.lower(text))
    scores = [
        F.struct(
            _word_count(padded, words).alias("n"), F.lit(lang).alias("lang")
        )
        for lang, words in STOPWORDS.items()
    ]
    best = F.greatest(*scores)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """64-bit-ish deterministic document fingerprint: xxhash64 of the
    normalized token stream (rolling-hash analog, portable)."""
    return F.xxhash64(normalized_text(text))


def md5_fingerprint(text: Column) -> Column:
    """Portable fingerprint shared with SQL oracles (DuckDB md5)."""
    return F.md5(normalized_text(text))


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


def ngram_repetition(
    df, id_col: str, text_col: str, ndigits: int = 4
):
    """Gopher-style n-gram repetition signals, per document:

    * ``dup_token_frac``  — 1 − unique/total tokens (``repetition_ratio``);
    * ``top_bigram_frac`` — occurrences of the most frequent bigram over
      all bigram occurrences (boilerplate headers/footers spike this);
    * ``dup_trigram_frac`` — fraction of trigram occurrences whose
      trigram appears more than once (templated/spun text spikes this).

    The machine-generated-text filters of Rae et al. 2021 (Gopher §A1.1),
    re-expressed relationally: explode ``shingles(n)`` once per n, count
    per (doc, n, gram) with map-side partial aggregation, then one
    per-doc conditional aggregate.  Both shuffles key on doc_id (+gram),
    which is as uniform as keys get — no hot keys, no driver state, and
    the gram strings never leave the first aggregation.
    """
    # Shape note (r16 optimization round): a fused single-scan variant
    # (both n-gram streams through one explode_outer over concatenated
    # (n, gram) struct arrays, per-doc scalars carried via first()) was
    # BUILT, MEASURED, AND REJECTED — interleaved A/B at sf0.1: fused
    # 1.98-2.15 s vs this shape's 1.55-1.72 s. The struct-array
    # materialization before the explode plus two extra first() buffers
    # per (doc, n, gram) group cost more than the two parquet scans they
    # save; the scans prune to (id, text) and the per-row split work is
    # identical either way.
    did = F.col(id_col)
    low = F.lower(F.col(text_col))
    grams = df.select(
        did.alias(id_col), F.lit(2).alias("n"),
        F.explode(shingles(F.col(text_col), 2)).alias("g"),
    ).unionByName(
        df.select(
            did.alias(id_col), F.lit(3).alias("n"),
            F.explode(shingles(F.col(text_col), 3)).alias("g"),
        )
    )
    counts = grams.groupBy(id_col, "n", "g").agg(F.count(F.lit(1)).alias("c"))
    c, n = F.col("c"), F.col("n")
    per_doc = counts.groupBy(id_col).agg(
        (
            F.max(F.when(n == 2, c)) / F.sum(F.when(n == 2, c))
        ).alias("__tb"),
        (
            F.sum(F.when((n == 3) & (c > 1), c)) / F.sum(F.when(n == 3, c))
        ).alias("__dt"),
    )
    base = df.select(
        did.alias(id_col),
        token_count(low).alias("n_tokens"),
        repetition_ratio(low, ndigits).alias("dup_token_frac"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        F.round(F.coalesce(F.col("__tb"), F.lit(0.0)), ndigits).alias(
            "top_bigram_frac"
        ),
        F.round(F.coalesce(F.col("__dt"), F.lit(0.0)), ndigits).alias(
            "dup_trigram_frac"
        ),
    )


# PII patterns — deliberately RE2-compatible (no backrefs/lookaround) so
# the same regex runs in Spark (Java), DuckDB (RE2), and any downstream
# engine. Detection/redaction only; these are filters, not guarantees.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (codegen ``regexp_count``)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind])).cast("long")


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder. Order matters:
    emails first (their domain part would otherwise feed the ipv4/phone
    patterns), then ipv4 before phone (dotted phone-likes inside an IP
    never happen, but an IP must not half-match the phone pattern)."""
    out = F.regexp_replace(text, PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "<IP>")
    return F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish sub-word split: words plus punctuation as separate tokens
    (regex word-boundary split; a deterministic stand-in for a real BPE).
    Codegen path: pad punctuation with spaces, strip outer whitespace,
    split on whitespace runs."""
    padded = F.regexp_replace(text, r"([^\w\s])", r" $1 ")
    stripped = F.regexp_replace(padded, r"^\s+|\s+$", "")
    return F.when(
        stripped == "", F.array().cast("array<string>")
    ).otherwise(F.split(stripped, r"\s+"))


def cooccurrence_pairs(df, id_col: str, text_col: str, window: int = 2):
    """Unordered word co-occurrence counts within ``window`` positions:
    one row per (w1 <= w2) pair with its corpus count.

    The pair stream is generated INSIDE the row — for each offset
    1..window, ``arrays_zip(slice(toks, 1, n-off), slice(toks, 1+off, ...))``
    pairs each token with its right neighbor — so there is NO positional
    self-join: the only shuffle is the final pair-count aggregation
    (map-side partial agg, uniform pair keys). The zip/concat are array
    expressions whose output explodes immediately, the same
    touch-each-element-once pattern as ``shingles``.
    """
    toks = tokenize(F.lower(F.col(text_col)))
    n = F.size(toks)
    zips = [
        F.when(
            n > off,
            F.arrays_zip(
                F.slice(toks, 1, n - off).alias("a"),
                F.slice(toks, 1 + off, n - off).alias("b"),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        for off in range(1, window + 1)
    ]
    pairs = df.select(
        F.explode(F.concat(*zips) if len(zips) > 1 else zips[0]).alias("p")
    ).select(
        F.least(F.col("p.a"), F.col("p.b")).alias("w1"),
        F.greatest(F.col("p.a"), F.col("p.b")).alias("w2"),
    )
    return pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("pair_count")
    )


def pmi_pairs(
    df,
    id_col: str,
    text_col: str,
    window: int = 2,
    min_count: int = 1,
    ndigits: int = 4,
):
    """Pointwise mutual information over co-occurring word pairs:
    ``pmi = ln((c_ab / N_pairs) / ((c_a / N_tok) * (c_b / N_tok)))``.

    Unigram counts are a vocabulary-sized table joined onto the pair
    counts twice (w1, w2) — vocabulary ~10^6-10^7 rows even at 100 TB, so
    both joins get broadcast hints; the scalar totals ride along in the
    same broadcast row. ``min_count`` prunes the noise floor (and makes
    the output set layout-independent for the hash gate).
    """
    co_all = cooccurrence_pairs(df, id_col, text_col, window)
    # totals over ALL co-occurrence events — min_count prunes the output,
    # not the probability space. Derived WITHOUT a second aggregate over
    # the pair table (r17, VERDICT r16 item 8): a doc with n tokens emits
    # exactly max(n - off, 0) pairs per offset 1..window (see
    # cooccurrence_pairs), so the grand total is one linear scan of
    # per-doc token COUNTS — no explode, no pair shuffle, integer-equal
    # to sum(pair_count) by construction (NULL text ⇒ size() = -1 ⇒ 0
    # pairs on both paths).
    n_tok_per_doc = F.size(tokenize(F.lower(F.col(text_col))))
    pairs_per_doc = sum(
        F.greatest(n_tok_per_doc - off, F.lit(0))
        for off in range(1, window + 1)
    )
    n_pairs = df.select(pairs_per_doc.alias("__p__")).agg(
        F.sum("__p__").cast("double").alias("n_pairs")
    )
    co = co_all.where(F.col("pair_count") >= min_count)
    uni = (
        df.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    totals = uni.agg(
        F.sum("wc").cast("double").alias("n_tok"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("wc").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("wc").alias("c2"))
    joined = (
        co.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_pairs))
    )
    pmi = F.log(
        (F.col("pair_count") / F.col("n_pairs"))
        / ((F.col("c1") / F.col("n_tok")) * (F.col("c2") / F.col("n_tok")))
    )
    return joined.select(
        "w1", "w2", "pair_count", F.round(pmi, ndigits).alias("pmi")
    )


def unigram_logprob_scores(
    df,
    id_col: str,
    text_col: str,
    alpha: float = 0.5,
    ndigits: int = 4,
):
    """Perplexity-style quality scoring against a unigram LM TRAINED ON
    THE CORPUS ITSELF (the KenLM-filter pattern with the simplest real
    model): per document, the mean log-probability of its tokens under
    add-alpha-smoothed corpus unigram frequencies. Documents far below
    the corpus's typical mean log-prob are gibberish/noise candidates;
    far above are repetitive/boilerplate candidates — both tails get
    filtered in practice.

    p(w) = (count(w) + alpha) / (N + alpha * (V + 1)); unseen words (when
    scoring a DIFFERENT corpus against this model) take count 0 — here
    every token is seen by construction.

    Scale shape: the model is the vocabulary table (one corpus-sized
    count shuffle, then broadcast); scoring joins each token occurrence
    to its probability map-side and partial-aggregates the per-doc mean.
    Returns ``(id, n_tokens, mean_logprob)``.
    """
    toks = df.select(
        F.col(id_col).alias(id_col),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"),
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = uni.agg(
        F.sum("c").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    logp = F.log(
        (F.col("c") + F.lit(alpha))
        / (F.col("n_total") + F.lit(alpha) * (F.col("v") + 1.0))
    )
    scored = (
        toks.join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(logp), ndigits).alias("mean_logprob"),
        )
    )
    return scored
