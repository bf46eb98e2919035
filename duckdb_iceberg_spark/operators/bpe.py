"""BPE tokenizer induction over a document corpus (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

Reference parity note: the reference engine (duckdb_iceberg) has no
tokenizer operators — this family belongs to the training-data
pipeline surface the build brief layers on top of the reference's
query engine.

Scale shape
-----------
Training never iterates over the corpus. The ONE distributed pass
collapses 100 TB of text to a (word, freq) vocabulary table — a
map-side-combine groupBy whose shuffle carries the vocabulary, not
the text. The greedy merge loop then runs driver-side over an
explicitly capped vocabulary (``max_vocab_words``, most-frequent
first) — the same word-count-table formulation HuggingFace
``tokenizers`` trains from; the cap is the documented, bounded
driver-memory budget (1M words ≈ tens of MB), not an accidental
collect.

Encoding re-uses the same collapse: each DISTINCT word is encoded
exactly once by an Arrow-batched pandas UDF (pure per-word local
work), and the per-word piece counts flow back to documents through
one join on the word key — the corpus text itself is never shipped
through Python row-at-a-time.
"""

# NOTE: no `from __future__ import annotations` here — it stringifies
# the pandas_udf signature hints and PySpark's typehint inference
# cannot resolve them inside a function body.
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.text import tokens

__all__ = ["bpe_train", "bpe_word_pieces", "bpe_token_counts", "bpe_piece_topk"]


def word_frequencies(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """(word, freq) over the lowercased whitespace-tokenized corpus —
    the single corpus-wide pass everything else derives from.

    ``tokens_col``: column already holding the lowercased whitespace
    token array (the layout layer's ltoks projection). Must equal
    ``split(trim(lower(text)), '\\s+')`` exactly for result parity —
    the regex tokenize is the dominant per-task kernel of this pass
    at scale, and a warehouse pays it once at ingest."""
    tok = F.col(tokens_col) if tokens_col else tokens(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(tok).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    """Apply one merge to a symbol tuple (left-to-right, as BPE does)."""
    out, i, n = [], 0, len(sym)
    a, b = pair
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_freq: int = 2,
    max_vocab_words: int = 1_000_000,
    wf: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the ranked merge list [(left, right), ...]. Deterministic:
    ties in pair frequency break on the pair's lexicographic order, so
    the same corpus always trains the same tokenizer.

    ``wf`` lets a caller that also encodes (train + apply is the
    normal pipeline) share ONE word-frequency corpus pass — persist
    `word_frequencies(df)` and hand it to both stages; the corpus is
    then tokenized twice total (here and the per-doc count), not
    three times.
    """
    vocab_rows = (
        (wf if wf is not None else word_frequencies(df, text_col))
        .where(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(max_vocab_words)
        .collect()
    )
    vocab = {tuple(r.w): r.freq for r in vocab_rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(sym, best): f for sym, f in vocab.items()}
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with a ranked merge list (greedy by rank —
    identical to applying the merges in training order)."""
    rank = {p: i for i, p in enumerate(merges)}
    sym = tuple(word)
    while len(sym) > 1:
        pairs = [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]
        ranked = [(rank[p], p) for p in pairs if p in rank]
        if not ranked:
            break
        sym = _merge_word(sym, min(ranked)[1])
    return list(sym)


def bpe_word_pieces(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    wf: DataFrame | None = None,
) -> DataFrame:
    """(word, freq, pieces array<string>, n_pieces) — every DISTINCT
    corpus word encoded once, via an Arrow-batched pandas UDF (the
    merge table rides to executors inside the closure; per-word work
    is purely local)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.StringType()))
    def _enc(words: pd.Series) -> pd.Series:
        return words.map(lambda w: encode_word(w, merges))

    # Marked nondeterministic to PIN the encode above the vocabulary
    # aggregate: a downstream explode(pieces) makes Catalyst infer a
    # size(pieces) > 0 filter and push the (deterministic) UDF down
    # through the groupBy — re-encoding every token INSTANCE instead
    # of every distinct word (measured at sf10: 188 s vs 5 s). The
    # function is pure; the flag only forbids the optimizer from
    # relocating/duplicating it.
    _enc = _enc.asNondeterministic()

    if wf is None:
        wf = word_frequencies(df, text_col)
    return wf.select(
        "w",
        "freq",
        _enc(F.col("w")).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces"))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "doc_id",
    wf: DataFrame | None = None,
    max_broadcast_vocab: int = 5_000_000,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document BPE token count under a trained merge list — the
    token-budget statistic a packing/sampling stage consumes.

    One explode of (doc, word) joined to the once-encoded distinct
    vocabulary, then a per-doc sum. (A 0/1-merge list of single-char
    pairs short-circuits to pure per-row JVM expressions instead —
    see the fast-path comment below.) The vocabulary side is the FULL
    corpus distinct-word table (so words pruned from training still
    encode), which under Heaps' law grows ~sqrt(corpus) — it is
    broadcast only while the Heaps-law estimate from the input size
    stays under ``max_broadcast_vocab`` rows; above that (the 100 TB
    regime) it falls back to a shuffle-hash join, because a forced
    broadcast of an unbounded table is a driver OOM with no AQE
    escape hatch. Below the threshold the broadcast is explicit: a
    corpus-derived table can never win AQE's auto-broadcast in time —
    the exploded token stream, the largest intermediate here, would
    already have written its exchange (the trap documented in
    SCALE.md).
    """
    tok = F.col(tokens_col) if tokens_col else tokens(F.lower(F.col(text_col)))
    if len(merges) <= 1 and all(
        len(part) == 1 and part != "\x01" for m in merges for part in m
    ):
        # Single-merge (or no-merge) fast path: the greedy encoder for
        # ONE merge of two single chars reduces a word to
        # len(w) - occ(w, a+b) pieces, where occ counts non-overlapping
        # left-to-right occurrences — exactly what string replace()
        # removes. Summed per document, everything becomes per-ROW JVM
        # expressions over the token array: no Python boundary, no
        # vocabulary join, no explode, no exchange at all (guide §4.1 /
        # §2.4). Cross-token false matches are impossible because the
        # \x01 join separator never appears in the (guarded) pair;
        # per-token replace therefore equals replace on the joined
        # string. Zero-word docs are dropped, matching the grouped
        # classic path.
        sumlen = F.length(F.concat_ws("", tok))
        if merges:
            ab = merges[0][0] + merges[0][1]
            joined = F.concat_ws("\x01", tok)
            occ = (
                F.length(joined) - F.length(F.replace(joined, F.lit(ab), F.lit("")))
            ) / F.lit(2)
        else:
            occ = F.lit(0)
        return (
            df.select(
                F.col(key_col),
                (sumlen - occ).cast("long").alias("bpe_tokens"),
                F.size(F.array_remove(tok, "")).cast("long").alias("words"),
            )
            .where(F.col("words") > 0)
        )
    pieces = bpe_word_pieces(df, merges, text_col, wf=wf).select("w", "n_pieces")
    dw = df.select(F.col(key_col), F.explode(tok).alias("w")).where(F.col("w") != "")
    # Heaps' law vocab estimate (V ~= 40 * sqrt(words), words ~= bytes/6)
    # from Catalyst's plan-size statistic: zero extra jobs, conservative
    # (raw logical size overestimates text bytes -> overestimates vocab).
    try:
        size_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        est_vocab = int(40 * (max(size_bytes, 1) / 6) ** 0.5)
    except Exception:
        est_vocab = 0  # stats unavailable -> keep the broadcast path
    vocab_side = F.broadcast(pieces) if est_vocab <= max_broadcast_vocab else pieces.hint("SHUFFLE_HASH")
    return (
        dw.join(vocab_side, "w")
        .groupBy(key_col)
        .agg(
            F.sum("n_pieces").alias("bpe_tokens"),
            F.count("*").alias("words"),
        )
    )


def bpe_piece_topk(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    top_k: int = 50,
    wf: DataFrame | None = None,
) -> DataFrame:
    """Corpus piece-frequency histogram head: the ``top_k`` BPE pieces
    by total corpus occurrences (piece count × word freq), ties broken
    by piece text — the vocabulary-usage view a tokenizer audit reads.
    """
    wp = bpe_word_pieces(df, merges, text_col, wf=wf)
    return (
        wp.select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(top_k)
    )
