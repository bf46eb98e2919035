"""Self-trained n-gram language-model quality scoring.

The CCNet / Gopher / FineWeb curation stacks score documents with a
small LM (KenLM) and keep the low-perplexity tail. This module is the
distributed, dependency-free version of that signal: train bigram
counts ON the corpus itself (or any reference corpus) and score each
document by its mean bigram log-probability under add-alpha smoothing

    score(d) = mean over bigrams (w1,w2) of  ln (c(w1,w2) + a) / (c(w1) + a*V)

Higher is more "typical" of the reference corpus; templated spam and
lorem-ipsum junk score low. Reference parity note: the reference
engine (duckdb_iceberg) has no LM scorer — this belongs to the
training-data-pipeline surface the build brief adds on top.

Scale shape (the whole point of doing this in Spark):
- bigram extraction is a per-row JVM expression (functions.text.shingles,
  bind_once so tokenization is O(len) not O(len^2));
- the two count tables are classic map-side-combine groupBys — the
  shuffle carries (ngram, partial count), never documents;
- scoring joins the exploded bigram stream against the bigram count
  table (shuffle on the bigram key — both sides hash-partitioned, no
  driver state) and against the unigram table + vocab scalar
  (broadcast: a natural-language unigram vocab is MBs at any corpus
  size, and ``broadcast_unigrams=False`` degrades gracefully to a
  shuffle join if a pathological corpus breaks that assumption).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingles, tokens


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
    tokens_col: str | None = None,
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies — the statistic
    BPE tokenizer training greedily merges on (Sennrich et al. 2016,
    step 1: count symbol pairs weighted by word frequency).

    Returns the ``top_k`` (pair, cnt) rows, ordered by cnt desc then
    pair asc (deterministic tie-break).

    Scale shape: the corpus collapses to a (word, freq) table first —
    a map-side-combine groupBy whose shuffle carries the vocabulary,
    not the text — and pair extraction is a per-row JVM transform over
    that small table. At 100 TB the heavy shuffle is the word count;
    everything after is vocabulary-sized. Repeated pairs inside one
    word each count ("aaa" -> "aa" twice), exactly as BPE requires.

    ``tokens_col``: column already holding the lowercased whitespace
    token array (the layout layer's ltoks projection); must equal
    ``split(trim(lower(text)), '\\s+')`` exactly for result parity —
    it skips the regex tokenize kernel in the one corpus pass."""
    tok = F.col(tokens_col) if tokens_col else tokens(F.lower(F.col(text_col)))
    words = (
        df.select(F.explode(tok).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    # sequence() infers a DESCENDING step when start > stop, so 1-char
    # words need the explicit empty-array guard, not sequence(1, 0).
    pairs = words.where(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(top_k)
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Train the model: (bigram counts, unigram counts) over the corpus.

    Bigrams keep duplicates (an LM counts occurrences, not distinct
    grams). Documents with fewer than two tokens contribute no
    bigrams.
    """
    bg = df.select(F.explode(shingles(F.col(text_col), 2)).alias("bg")).where(
        F.col("bg").contains(" ")
    )
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    uni = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("c1"))
    return c12, c1


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    counts: tuple[DataFrame, DataFrame] | None = None,
    broadcast_unigrams: bool = True,
    tokens_col: str | None = None,
    bigram_broadcast_limit: int = 0,
) -> DataFrame:
    """Score every document by mean smoothed bigram log-probability.

    Returns (key_col, lm_score double). Pass ``counts`` to score
    against a model trained on a different (reference) corpus;
    default trains on ``df`` itself. Documents with no bigrams (< 2
    tokens) are dropped — they carry no signal.

    ``tokens_col``: name of a column already holding the LOWERCASED
    whitespace token array (a pre-tokenized layout projection). The
    tokenize kernel is this operator's dominant scan cost at scale —
    a warehouse materializes it once at ingest, not per query. Must
    equal ``split(trim(lower(text)), '\\s+')`` exactly for result
    parity with the raw path (self-trained path only).

    ``bigram_broadcast_limit``: 0 (default) keeps construction fully
    LAZY — no Spark job runs until the caller executes the result.
    A positive limit opts into the small-model specialization: one
    eager vocab-count job at construction time decides whether
    vocab² fits under the limit; if it does, both model tables
    broadcast and documents never shuffle. Opt-in because a library
    call that silently runs jobs before ``.count()``/``.write`` is a
    surprise (r8 ADVICE); the entry layer passes 4M when the corpus
    size gate says the broadcast floors pay off.

    .. versionchanged:: round 9
       The default changed from ``4_000_000`` to ``0``: the broadcast
       specialization is now opt-in. External callers relying on the
       old eager default must pass ``bigram_broadcast_limit=4_000_000``
       explicitly to restore the previous plan shape.
    """
    from ..functions.text import bind_once

    if counts is not None:
        # External (reference-corpus) model: counts come in as tables
        # keyed by the "w1 w2" bigram string, so the join is
        # unavoidable — this path trades speed for the cross-corpus
        # API.
        c12, c1 = counts
        bg = df.select(
            F.col(key_col), F.explode(shingles(F.col(text_col), 2)).alias("bg")
        ).where(F.col("bg").contains(" "))
        # LEFT join + coalesce-to-0: bigrams absent from the reference
        # model must score the smoothing floor a/(c1+aV), not vanish
        # from the average — an OOV-garbage doc scored only on its few
        # known bigrams would otherwise rank as high quality, the
        # opposite of the KenLM-style filter this advertises.
        scored = (
            bg.join(c12, "bg", "left")
            .withColumn("c12", F.coalesce(F.col("c12"), F.lit(0)))
            .withColumn("__w1", F.split(F.col("bg"), " ")[0])
        )
    else:
        # Self-trained fast path. Two structural choices, both forced
        # by scale: (1) the bigram is a (w1, w2) STRUCT, never a
        # concatenated string — no per-shingle concat_ws on the way
        # out, no split() re-parse on the way back; (2) the corpus
        # count c12 is a FULL-PARTITION WINDOW over the instance
        # stream, not a join against a re-exploded copy of the corpus
        # — one tokenize pass, ONE exchange on the pair, zero
        # self-joins. (The join formulation paid the big side's
        # shuffle before AQE could see the model table was
        # broadcast-sized — an AQE replanning boundary, so the fix is
        # structural, not a hint. sf10: 61 s -> ~20 s.)
        #
        # Small-model specialization (round 8): when vocab² bounds the
        # distinct-bigram count under ~4M, the model tables are
        # PROVABLY broadcast-sized before they are built, and the
        # instance stream never shuffles at all: bigram/unigram
        # identities collapse to xxhash64 LONGs (the dedup_span_stats
        # digest precedent), both count tables broadcast, and the
        # per-doc average partial-aggregates map-side. The vocab count
        # is one token-stream pass — the same pass the crossJoin'd
        # vocab aggregate pays anyway. Measured at sf10 (31-word
        # synthetic vocab): 6.8 s -> ~3 s. Real corpora (vocab ~1M+)
        # take the window path unchanged.
        t = F.col(tokens_col) if tokens_col else tokens(F.lower(F.col(text_col)))
        # SQL-string twins of the hot projections below (one parse
        # round trip instead of a gateway call per sub-expression —
        # §7.3 driver latency; identical trees, double literals
        # D-suffixed so they stay DOUBLE, not DECIMAL).
        a_sql = f"{float(alpha)!r}D"

        def _pairs(tb):
            # arrays_zip (no lambda) over the two shifted slices: ~9%
            # cheaper than the equivalent zip_with at sf10 — Catalyst
            # interprets HOF lambdas per element (~400 ns, the round-5
            # boundary), and zip_with pays that on top of the slices.
            # The remaining construction cost is that interpretation
            # floor: transform+element_at and zip_with both measured
            # slower than this shape. Struct fields are "0"/"1".
            return F.arrays_zip(
                F.slice(tb, 1, F.size(tb) - 1),
                F.slice(tb, 2, F.size(tb) - 1),
            )

        if tokens_col:
            uni = df.selectExpr(f"explode(`{tokens_col}`) AS w")
        else:
            uni = df.select(F.explode(t).alias("w"))
        c1 = uni.groupBy("w").agg(F.expr("count(*) AS c1"))
        # bind_once exists to stop Catalyst re-evaluating a COMPUTED
        # token expression per reference; on a materialized token
        # column it is pure interpreted-lambda overhead (measured at
        # sf10: 1.7 s -> 0.5 s for the pair construction alone)
        if tokens_col:
            tc = f"`{tokens_col}`"
            pairs_col = F.expr(
                f"arrays_zip(slice({tc}, 1, size({tc}) - 1), "
                f"slice({tc}, 2, size({tc}) - 1))"
            )
        else:
            pairs_col = bind_once(t, _pairs)
        # limit 0 disables the gate WITHOUT paying the vocab-count job.
        # (Persisting c1 across the count and the c1h broadcast build
        # was measured at sf10 and REJECTED: +2.7% — the cache
        # fill/read costs more than the saved vocab-sized recompute.)
        v = c1.count() if bigram_broadcast_limit > 0 else None
        if v is not None and v * v <= bigram_broadcast_limit:
            inst = df.select(
                F.col(key_col), F.explode(pairs_col).alias("p")
            ).select(
                F.col(key_col),
                F.xxhash64(F.col("p")["0"], F.col("p")["1"]).alias("__ph"),
                F.xxhash64(F.col("p")["0"]).alias("__w1h"),
            )
            c12h = inst.groupBy("__ph").agg(F.count("*").alias("c12"))
            # exact string counts keyed by hash; sum on the (never in
            # practice) colliding key so a collision can merge counts
            # but never duplicate join rows
            c1h = (
                c1.select(F.xxhash64("w").alias("__w1h"), "c1")
                .groupBy("__w1h")
                .agg(F.sum("c1").alias("c1"))
            )
            return (
                inst.join(F.broadcast(c12h), "__ph")
                .join(F.broadcast(c1h), "__w1h", "left")
                .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
                .groupBy(key_col)
                .agg(
                    F.avg(
                        F.log(
                            (F.col("c12") + F.lit(alpha))
                            / (F.col("c1") + F.lit(alpha) * F.lit(float(v)))
                        )
                    ).alias("lm_score")
                )
            )
        scored = (
            df.select(F.col(key_col), F.explode(pairs_col).alias("p"))
            .selectExpr("*", "count(*) OVER (PARTITION BY p) AS c12")
            .selectExpr("*", "p.`0` AS __w1")
        )
        if v is None:
            # Window path without the eager vocab job (r11): V rides on
            # the unigram table as a full-table window count instead of
            # a SEPARATE scalar aggregate branch — the old
            # c1.agg(count) + crossJoin(vocab) re-tokenized the whole
            # corpus a third time (its own scan -> explode -> two
            # agg/exchange chains -> BroadcastNestedLoopJoin). The
            # single-partition window runs over the vocab-sized c1
            # table, the same driver-bounded relation the broadcast
            # already ships. Self-trained w1 always matches c1 (same
            # tokenization built both), so carrying __v on the join
            # row is total; values are identical because V is the same
            # COUNT(*) over c1 either way.
            c1w = c1.selectExpr(
                "w AS __w1", "c1", "count(*) OVER () AS __v"
            )
            if broadcast_unigrams:
                c1w = F.broadcast(c1w)
            return (
                scored.join(c1w, "__w1", "left")
                .withColumn("c1", F.expr("coalesce(c1, 0)"))
                .groupBy(key_col)
                .agg(
                    F.expr(
                        f"avg(ln((c12 + {a_sql}) / (c1 + {a_sql} * __v)))"
                        " AS lm_score"
                    )
                )
            )
        if v is not None:
            # The gate already paid the vocab-count job — reuse the
            # number as a literal instead of re-aggregating c1 (which
            # would re-pay the tokenize+distinct pass) and crossJoining
            # it back in (r8 ADVICE).
            c1w = c1.select(F.col("w").alias("__w1"), F.col("c1"))
            if broadcast_unigrams:
                c1w = F.broadcast(c1w)
            return (
                scored.join(c1w, "__w1", "left")
                .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
                .groupBy(key_col)
                .agg(
                    F.avg(
                        F.log(
                            (F.col("c12") + F.lit(alpha))
                            / (F.col("c1") + F.lit(alpha) * F.lit(float(v)))
                        )
                    ).alias("lm_score")
                )
            )
    vocab = c1.agg(F.count("*").alias("__v"))
    c1w = c1.select(F.col("w").alias("__w1"), F.col("c1"))
    if broadcast_unigrams:
        c1w = F.broadcast(c1w)
        vocab = F.broadcast(vocab)
    # Left join for the same OOV reason (self-trained path always
    # matches — w1 comes from the same tokenization that built c1).
    return (
        scored.join(c1w, "__w1", "left")
        .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
        .crossJoin(vocab)
        .groupBy(key_col)
        .agg(
            F.avg(
                F.log(
                    (F.col("c12") + F.lit(alpha))
                    / (F.col("c1") + F.lit(alpha) * F.col("__v"))
                )
            ).alias("lm_score")
        )
    )
