"""Decontamination: overlap semantics + the broadcast-probe plan shape."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from summingbird_spark.functions.dedup import contamination


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_contamination_flags_only_overlapping_docs(spark):
    train = _df(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated words here nothing shared at all"),
        (3, "a quick brown fox appears again in this text"),
    ])
    ev = _df(spark, [(100, "quick brown fox benchmarks")])
    out = {r.doc_id: r for r in contamination(train, ev, "doc_id", "text", shingle_n=3).collect()}
    assert set(out) == {1, 3}  # both contain the 3-gram 'quick brown fox'
    assert out[1].n_matched_ngrams == 1 and out[1].n_eval_docs_hit == 1


def test_contamination_counts_distinct_grams_and_eval_docs(spark):
    train = _df(spark, [(1, "x y z p q r x y z")])  # 'x y z' twice -> 1 distinct
    ev = _df(spark, [(100, "x y z"), (101, "p q r and x y z")])
    [r] = contamination(train, ev, "doc_id", "text", shingle_n=3).collect()
    assert r.n_matched_ngrams == 2  # 'x y z', 'p q r'
    assert r.n_eval_docs_hit == 2


def test_contamination_eval_side_broadcasts(spark):
    train = _df(spark, [(i, f"w{i} a b c d e") for i in range(50)])
    ev = _df(spark, [(100, "a b c d")])
    plan = (
        contamination(train, ev, "doc_id", "text", shingle_n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_cross_doc_repetition_hand_computed(spark):
    from summingbird_spark.functions.dedup import cross_doc_repetition

    rows = [
        (1, "a b c a b c"),   # "a b c" twice; shared with doc 2
        (2, "a b c x y z"),
        (3, "q r s t"),       # nothing shared
        (4, "xy"),            # too short for a 3-gram -> no output row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_gram_frac"], r["dup_distinct_frac"])
        for r in cross_doc_repetition(df, "doc_id", "text", shingle_n=3).collect()
    }
    assert got == {
        1: (0.5, 0.3333),    # 2 of 4 occurrences / 1 of 3 distinct grams
        2: (0.25, 0.25),
        3: (0.0, 0.0),
    }


def test_remove_duplicate_spans_hand_computed(spark):
    from summingbird_spark.functions.dedup import remove_duplicate_spans

    rows = [
        (1, "x y z a b c"),    # "x y z" shared with doc 2 -> positions 0-2 go
        (2, "x y z q r"),      # same span goes; "q r" survives
        (3, "u v w"),          # unique -> untouched
        (4, "p q"),            # too short for a 3-gram -> untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", 3, 2).collect()
    }
    assert got == {
        1: ("a b c", 3, 3),
        2: ("q r", 2, 3),
        3: ("u v w", 3, 0),
        4: ("p q", 2, 0),
    }


def test_remove_duplicate_spans_full_coverage_empties_doc(spark):
    from summingbird_spark.functions.dedup import remove_duplicate_spans

    rows = [(1, "a b c"), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", 3, 2).collect()
    }
    assert got == {1: ("", 3), 2: ("", 3)}


def test_remove_duplicate_spans_intra_doc_repeat_not_removed(spark):
    """min_df counts DOCUMENTS: a gram repeated within one doc only is
    not cross-document boilerplate and must survive."""
    from summingbird_spark.functions.dedup import remove_duplicate_spans

    rows = [(1, "m n o m n o"), (2, "zz ww")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = remove_duplicate_spans(df, "doc_id", "text", 3, 2).collect()
    by = {r["doc_id"]: r["n_removed"] for r in got}
    assert by == {1: 0, 2: 0}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpus = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=_corpus, n=st.sampled_from([2, 3]), min_df=st.sampled_from([2, 3]))
def test_remove_duplicate_spans_property(spark, corpus, n, min_df):
    from summingbird_spark.functions.dedup import remove_duplicate_spans

    texts = {i: " ".join(words) for i, words in enumerate(corpus)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    # naive reference
    grams = {}
    for d, words in enumerate(corpus):
        for s in range(len(words) - n + 1):
            grams.setdefault(" ".join(words[s : s + n]), set()).add(d)
    hot = {g for g, docs in grams.items() if len(docs) >= min_df}
    want = {}
    for d, words in enumerate(corpus):
        covered = set()
        for s in range(len(words) - n + 1):
            if " ".join(words[s : s + n]) in hot:
                covered.update(range(s, s + n))
        kept = [w for p, w in enumerate(words) if p not in covered]
        want[d] = (" ".join(kept), len(kept), len(words) - len(kept))

    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", n, min_df).collect()
    }
    assert got == want


def test_bloom_method_equals_broadcast(spark, tables):
    """The Bloom prefilter must be invisible in the result: no false
    negatives by construction (positions derive from the digest itself),
    false positives removed by the exact verify join — so bloom ==
    broadcast bit-for-bit, across shingle sizes and a tiny filter
    (high-FP regime exercises the verify path)."""
    from summingbird_spark.functions.dedup import contamination

    docs = tables("documents")
    ev = docs.where("doc_id % 31 = 0")
    exact = {}
    for n in (2, 3):
        exact[n] = sorted(
            tuple(r)
            for r in contamination(docs, ev, "doc_id", "text", shingle_n=n).collect()
        )
        b = sorted(
            tuple(r)
            for r in contamination(
                docs, ev, "doc_id", "text", shingle_n=n, method="bloom"
            ).collect()
        )
        assert exact[n] == b and len(b) > 0
    # deliberately undersized filter: many FPs, still exact output
    tiny = sorted(
        tuple(r)
        for r in contamination(
            docs, ev, "doc_id", "text", shingle_n=2, method="bloom",
            bloom_bits_per_item=2, bloom_k=2,
        ).collect()
    )
    assert tiny == exact[2]


def test_contamination_bloom_k_validated(spark):
    """bloom_k slices 8 hex chars of the 32-char md5 per position — k > 4
    runs past the digest (NULL positions, UDF crash); k < 1 is no filter.
    Both must fail fast with a clear message (ADVICE r6)."""
    import pytest

    docs = _df(spark, [(1, "a b c")])
    for bad in (0, 5, -1):
        with pytest.raises(ValueError, match="bloom_k"):
            contamination(docs, docs, "doc_id", "text",
                          method="bloom", bloom_k=bad)
