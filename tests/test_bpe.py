"""BPE tokenizer induction: hand-computed merges, encode/decode
invariants, determinism, and the piece-count bookkeeping that backs
the oracle-checked entry."""

import pytest

from duckdb_iceberg_spark.operators.bpe import (
    bpe_piece_topk,
    bpe_token_counts,
    bpe_train,
    bpe_word_pieces,
    encode_word,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_bpe_train_hand_computed(spark):
    # freq: low=3, lowest=2  ->  pair counts: l+o=5, o+w=5, w+e=2,
    # e+s=2, s+t=2. Tie at 5 breaks lexicographically: ("l","o").
    # After merge 1: lo+w=5 wins. Then low+e=2 / e+s / s+t tie on 2
    # -> ("e","s") lexicographically.
    df = _corpus(spark, ["low low lowest", "low lowest"])
    merges = bpe_train(df, num_merges=3, min_freq=1)
    assert merges == [("l", "o"), ("lo", "w"), ("e", "s")]


def test_bpe_train_deterministic(spark):
    df = _corpus(spark, ["aab abab baba", "abba baab aab"])
    m1 = bpe_train(df, num_merges=5, min_freq=1)
    m2 = bpe_train(df, num_merges=5, min_freq=1)
    assert m1 == m2 and len(m1) == 5


def test_encode_word_roundtrip_and_rank_order():
    merges = [("a", "b"), ("ab", "c"), ("d", "e")]
    for w in ["abcde", "aabbcc", "abcabc", "xyz", "a", ""]:
        pieces = encode_word(w, merges)
        assert "".join(pieces) == w
    # greedy-by-rank: "abc" -> ab+c -> abc (one piece)
    assert encode_word("abc", merges) == ["abc"]
    # left-to-right non-overlap inside one merge: "aaa" with (a,a)
    assert encode_word("aaa", [("a", "a")]) == ["aa", "a"]


def test_word_pieces_and_counts(spark):
    df = _corpus(spark, ["aaab aaab ab", "ab aaab"])
    merges = bpe_train(df, num_merges=1, min_freq=1)
    assert merges == [("a", "a")]
    wp = {r.w: (r.pieces, r.n_pieces) for r in bpe_word_pieces(df, merges).collect()}
    assert wp["aaab"] == (["aa", "a", "b"], 3)
    assert wp["ab"] == (["a", "b"], 2)
    tc = {r.doc_id: (r.bpe_tokens, r.words) for r in bpe_token_counts(df, merges).collect()}
    assert tc[0] == (3 + 3 + 2, 3)
    assert tc[1] == (2 + 3, 2)


def test_zero_merges_counts_chars(spark):
    df = _corpus(spark, ["abc de", "x"])
    tc = {r.doc_id: r.bpe_tokens for r in bpe_token_counts(df, []).collect()}
    assert tc == {0: 5, 1: 1}


def test_more_merges_never_increase_tokens(spark):
    df = _corpus(spark, ["the cat sat on the mat", "the cat ran", "a mat sat there"])
    prev = None
    for n in (0, 2, 5, 10):
        merges = bpe_train(df, num_merges=n, min_freq=1)
        total = sum(
            r.bpe_tokens for r in bpe_token_counts(df, merges).collect()
        )
        if prev is not None:
            assert total <= prev
        prev = total


def test_piece_topk_mass_conserved(spark):
    df = _corpus(spark, ["ab ab cd", "ab cd cd"])
    # 0 merges: piece mass == char mass of the corpus words
    top = bpe_piece_topk(df, [], top_k=10).collect()
    assert sum(r.cnt for r in top) == 12
    assert top[0].cnt >= top[-1].cnt


def test_pair_counts_tokens_col_parity(spark):
    """bpe_pair_counts(tokens_col=) must reproduce the raw-text path
    exactly — the ltoks projection contract (ltoks IS
    split(trim(lower(text)), '\\s+')), including empty docs and
    repeated in-word pairs."""
    from pyspark.sql import functions as F

    from duckdb_iceberg_spark.operators.lm import bpe_pair_counts

    df = _corpus(
        spark,
        ["low low lowest", "  Banana bandana ", "", "   ", "aaa aaa bb"],
    )
    raw = bpe_pair_counts(df, top_k=100).collect()
    tok = df.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("ltoks")
    )
    proj = bpe_pair_counts(tok, top_k=100, tokens_col="ltoks").collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in proj]
    assert ("an", 4) in [tuple(r) for r in raw]  # banana=2 + bandana=2


def test_token_counts_single_merge_fast_path_parity(spark):
    """The 0/1-merge expression fast path must reproduce the classic
    vocabulary-join path exactly — overlap greediness ('aaa' under
    (a,a)), repeated pairs ('erer'), boundary non-matches ('eerr'),
    docs that vanish (all-whitespace), and the tokens_col route."""
    from pyspark.sql import functions as F

    rows = [
        "er erer eerr rere",
        "aaa aa aaaa",
        "the quick er brown",
        "",
        "   ",
        "xyz",
    ]
    df = _corpus(spark, rows)

    def classic(frame, merges):
        # the pre-fast-path shape, inlined: explode -> vocab join -> sum
        tok = F.split(F.trim(F.lower("text")), r"\s+")
        pieces = bpe_word_pieces(frame, merges).select("w", "n_pieces")
        dw = frame.select("doc_id", F.explode(tok).alias("w")).where(F.col("w") != "")
        return (
            dw.join(F.broadcast(pieces), "w")
            .groupBy("doc_id")
            .agg(F.sum("n_pieces").alias("bpe_tokens"), F.count("*").alias("words"))
        )

    for merges in ([], [("e", "r")], [("a", "a")]):
        got = {tuple(r) for r in bpe_token_counts(df, merges).collect()}
        want = {tuple(r) for r in classic(df, merges).collect()}
        assert got == want, (merges, got, want)
        # no Python eval in the fast-path plan
        plan = bpe_token_counts(df, merges)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    # tokens_col route
    tok = df.select("doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("ltoks"))
    got = {tuple(r) for r in bpe_token_counts(tok, [("e", "r")], tokens_col="ltoks").collect()}
    want = {tuple(r) for r in classic(df, [("e", "r")]).collect()}
    assert got == want

    # a multi-char merge part must NOT take the fast path (values still agree)
    multi = bpe_token_counts(df, [("er", "e")])
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan or "ArrowEval" in plan
