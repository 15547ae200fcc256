"""BPE learner: differential test against a reference Python BPE
(Sennrich et al.'s algorithm), plus step-level unit checks."""

from collections import Counter

from summingbird_spark.functions.bpe import (
    apply_merge,
    bpe_learn,
    initial_symbols,
    pair_counts,
    top_pair,
    word_freqs,
)


def reference_bpe(texts, n_merges):
    """Plain-Python BPE on word frequencies; ties break lexicographically."""
    freqs = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                freqs[w] += 1
    symbols = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in symbols.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freqs[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w, syms in symbols.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges, symbols


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide new low",
]


def test_bpe_learn_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")
    got_merges, got_syms = bpe_learn(df, "text", n_merges=8)
    want_merges, want_syms = reference_bpe(TEXTS, 8)
    assert got_merges == want_merges
    got_tbl = {r["word"]: list(r["symbols"]) for r in got_syms.collect()}
    assert got_tbl == want_syms


def test_initial_symbols_and_first_pair(spark):
    df = spark.createDataFrame([(1, "aa aa ab")], "id long, text string")
    syms = initial_symbols(word_freqs(df, "text"))
    tbl = {r["word"]: list(r["symbols"]) for r in syms.collect()}
    assert tbl == {"aa": ["a", "a", "</w>"], "ab": ["a", "b", "</w>"]}
    # (a,a) appears in 'aa' (freq 2) -> 2; (a,</w>) 2; (a,b) 1; (b,</w>) 1
    pc = {(r["a"], r["b"]): r["cnt"] for r in pair_counts(syms).collect()}
    assert pc == {("a", "a"): 2, ("a", "</w>"): 2, ("a", "b"): 1, ("b", "</w>"): 1}
    assert top_pair(syms)[:2] == ("a", "</w>")  # tie 2-2 breaks lexicographically


def test_apply_merge_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([(1, "aaa")], "id long, text string")
    syms = initial_symbols(word_freqs(df, "text"))
    merged = apply_merge(syms, "a", "a")
    assert list(merged.collect()[0]["symbols"]) == ["aa", "a", "</w>"]


def test_bpe_encode_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    from summingbird_spark.functions.bpe import bpe_encode

    merges, _ = bpe_learn(df, "text", n_merges=6)
    _, ref_syms = reference_bpe(TEXTS, 6)
    got = {
        r["id"]: list(r["bpe_tokens"])
        for r in bpe_encode(df, "text", merges, id_col="id").collect()
    }
    for i, t in enumerate(TEXTS):
        want = [s for w in t.lower().split() if w for s in ref_syms[w]]
        assert got[i] == want, (i, got[i], want)


def test_bpe_encode_empty_and_unseen(spark):
    from summingbird_spark.functions.bpe import bpe_encode

    df = spark.createDataFrame([(1, "low xyz"), (2, "")], "id long, text string")
    got = {
        r["id"]: list(r["bpe_tokens"])
        for r in bpe_encode(df, "text", [("l", "o"), ("lo", "w")], id_col="id").collect()
    }
    # 'xyz' never saw these merges -> stays character-split
    assert got[1] == ["low", "</w>", "x", "y", "z", "</w>"]
    assert got[2] == []
