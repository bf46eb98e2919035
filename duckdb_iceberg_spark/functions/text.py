"""Text-analysis functions for large-scale document pipelines.

All pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen'd, no Python UDFs — so they run at full speed over
100 TB document tables. Each has an exact ANSI-SQL twin used by the
DuckDB oracle (hash functions limited to md5, which both engines
implement identically).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic, regex-dialect-portable (valid in both Java regex and
# RE2) token pattern: lowercase words, digit runs, or single symbols.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# language marker words for the n-gram/stopword language-ID heuristic;
# ordered dict — ties break by this priority order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "des", "est"],
    "zh": ["zh"],  # synthetic corpus marker
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def normalize(col) -> Column:
    """Lowercase + whitespace-collapse + trim (fingerprint canon form)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    """Whitespace token count. Counts non-space runs with
    ``regexp_count`` instead of ``size(split(...))`` — identical values
    (split of a trimmed empty string yields [''] = 1; greatest maps the
    regexp count's 0 to 1; null stays null) without materializing a
    per-document token array, ~15% off the scan kernel and far less
    allocator pressure (equivalence pinned by a property test)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.greatest(F.regexp_count(c, F.lit(r"\S+")), F.lit(1)))


def regex_token_count(col) -> Column:
    """BPE-ish regex token count (words / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), F.lit(0)))


# trie-factored alternation over exactly STOPWORDS: the regex engine
# tries 5 prefix branches per position instead of 10 literals
# (sf10 documents: another ~20% off the scan; equivalence to the flat
# "|".join(STOPWORDS) pattern is pinned by a unit test)
_STOPWORD_TRIE = r"\b(?:a(?:nd)?|t(?:he|o)|o[fn]|i[nst]|for)\b"


def stopword_count(col) -> Column:
    # regexp_count + non-capturing group: same match count as
    # size(regexp_extract_all(...)) without materializing the match
    # array (sf10 documents: 5.8 -> 4.3 s net)
    return F.regexp_count(F.lower(col), F.lit(_STOPWORD_TRIE))


# every char the regex formulation [^a-zA-Z0-9\s] treats as
# non-punct; Java \s is exactly [ \t\n\x0B\f\r]
_NON_PUNCT = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\x0b\f\r"
)


def punct_count(col) -> Column:
    """Count of chars outside [a-zA-Z0-9\\s]. Implemented as
    translate-delete of the keep-set + length: one hash lookup per
    char instead of a regex match allocating a per-char array
    (sf10 documents: 10.2 -> 3.1 s net; values identical — the
    DuckDB oracle keeps the regex formulation)."""
    return F.length(F.translate(col, _NON_PUNCT, ""))


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: favors mid-length docs with
    low punctuation density and a natural stopword ratio."""
    return quality_score_from_stats(
        token_count(col), F.length(col), stopword_count(col), punct_count(col)
    )


def quality_score_from_stats(n_tok, n_char, n_stop, n_punct) -> Column:
    """:func:`quality_score` over ALREADY-computed counters (the token
    projection's ingest-time stats) — value-identical by construction
    since quality_score delegates here with the raw expressions."""
    n_tok = n_tok.cast("double")
    n_char = n_char.cast("double")
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_char, F.lit(1.0))
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    raw = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    # floor-quantize instead of round: identical in both engines (round
    # half-up vs half-even ties differ between Spark and DuckDB)
    return F.floor(raw * 10000) / 10000


def quality_score_from_stats_sql(
    n_tok: str, n_char: str, n_stop: str, n_punct: str
) -> str:
    """Spark-SQL string twin of :func:`quality_score_from_stats` over
    NAMED counter columns — one py4j parse round trip instead of a
    gateway call per arithmetic node (§7.3 driver latency). Double
    literals are D-suffixed so they parse as DOUBLE (bare ``0.4``
    parses as DECIMAL in Spark SQL); identical tree otherwise."""
    td = f"cast(`{n_tok}` as double)"
    cd = f"cast(`{n_char}` as double)"
    return (
        f"floor((0.4D * least({td} / 64.0D, 1.0D) "
        f"+ 0.3D * least(`{n_stop}` / greatest({td}, 1.0D) * 4, 1.0D) "
        f"+ 0.3D * (1.0D - least(`{n_punct}` / greatest({cd}, 1.0D) * 4, "
        f"1.0D))) * 10000) / 10000"
    )


def lang_id(col) -> Column:
    """Marker-word language ID: argmax of per-language marker hit
    counts, ties broken by LANG_MARKERS order, no hits -> 'und'."""
    scores = {
        lang: F.size(F.regexp_extract_all(F.lower(col), F.lit(r"\b(" + "|".join(ws) + r")\b"), F.lit(0)))
        for lang, ws in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def lang_id_sql(col: str) -> str:
    """DuckDB-SQL twin of :func:`lang_id` (same scores, same ties)."""
    score = {
        lang: rf"len(regexp_extract_all(lower({col}), '\b(" + "|".join(ws) + r")\b'))"
        for lang, ws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    expr = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        expr = f"CASE WHEN {score[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return f"CASE WHEN {best} > 0 THEN {expr} ELSE 'und' END"


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 chosen so
    the DuckDB oracle computes the identical value)."""
    return F.md5(normalize(col))


ROLLING_BASE = 257
ROLLING_MOD = 1_000_000_007


def rolling_hash(col) -> Column:
    """Polynomial rolling hash of the normalized text:
    ``h = sum(ascii(c_i) * B^i) mod M`` folded left-to-right as
    ``h = (h*B + ascii(c)) % M`` — a JVM-side higher-order-function
    fold (no UDF), reproducible in DuckDB with list_reduce."""
    chars = F.split(normalize(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )


def rolling_hash_sql(col: str) -> str:
    """DuckDB twin of :func:`rolling_hash`."""
    norm = f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(x) AS BIGINT) for x in string_split_regex({norm}, '')]), "
        f"(acc, c) -> (acc * {ROLLING_BASE} + c) % {ROLLING_MOD})"
    )


def bind_once(expr, build) -> Column:
    """Evaluate ``expr`` ONCE per row and pass it as a bound variable
    to ``build`` (wrapped in a 1-element array whose transform lambda
    carries it). Catalyst neither let-binds nor CSEs inside
    higher-order-function lambdas, so a computed expression referenced
    N times inside one evaluates N times — for an expression that is
    itself O(len), that turns linear work quadratic (measured: 3-gram
    shingling at sf10 went from never-finishing to 215 s with this)."""
    return F.transform(F.array(expr), build)[0]


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles -> array<string> (may contain duplicates).

    The token array is bound once per row (:func:`bind_once`) before
    the per-shingle lambda indexes into it 3n times — inlining the
    split() would re-tokenize the document per shingle, O(len^2 * n)
    per row (same class as vectors.quantize_int8's absmax binding).
    """
    t = tokens(F.lower(col))

    def _build(tb):
        return F.when(
            F.size(tb) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tb) - n),
                lambda i: F.concat_ws(" ", *[F.element_at(tb, i + j + 1) for j in range(n)]),
            ),
        ).otherwise(F.array(F.concat_ws(" ", tb)))

    return bind_once(t, _build)


def span_hashes(col, n: int = 8) -> Column:
    """xxhash64 digests of the word n-gram spans -> array<long>.

    The COUNTING twin of :func:`shingles`: identical span boundaries
    (including the whole-text fallback for docs shorter than ``n``
    tokens), but each span surfaces as the xxhash64 of its token
    sub-array instead of a concatenated string — no per-span string
    allocation on the way out and 8-byte rows on any downstream
    exchange. Collisions are the usual 2^-64-scale rounding error of
    hash-based dedup statistics. Use where only span IDENTITY matters
    (doc-frequency, duplication stats); use shingles() where the span
    TEXT must survive.

    The digest is the FLAT n-argument ``xxhash64(tok_i, ...,
    tok_{i+n-1})``, not xxhash64 over a sliced sub-array: the array
    overload allocates a copy per span and recurses per element in
    the interpreted lambda path — measured 2.6-3.9x slower at sf10
    (n=3: 3.6 vs 1.4 s; n=8: 6.8 vs 1.8 s). Argument lengths feed the
    hash stream, so ("ab","c") and ("a","bc") stay distinct. NOTE:
    this changes the concrete digest VALUES vs rounds <= 10 — any
    artifact that persists these digests must be version-bumped (the
    benchgrams layout family is; see entries/layout.py).
    """
    t = tokens(F.lower(col))

    def _build(tb):
        return _flat_span_hashes(tb, n)

    return bind_once(t, _build)


def _flat_span_hashes(tb, n: int):
    """Shared flat-hash span builder over a BOUND token array."""
    return F.when(
        F.size(tb) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tb) - n),
            lambda i: F.xxhash64(*[F.element_at(tb, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array(F.xxhash64(tb)))


def span_hashes_tokens(tok_col, n: int = 8) -> Column:
    """:func:`span_hashes` over an ALREADY-tokenized (lowercased)
    array column — the pre-tokenized layout projection skips both the
    regex split and the bind_once interpretation wrapper (a
    materialized attribute re-reads for free). Span boundaries, the
    <n whole-doc fallback, and the flat-hash digest scheme are
    identical to :func:`span_hashes`.

    When ``tok_col`` is a column NAME the expression is built as one
    SQL string (single py4j parse round trip instead of ~4 gateway
    calls per span position — §7.3 driver latency; the parsed tree is
    the identical expression)."""
    if isinstance(tok_col, str):
        return F.expr(_flat_span_hashes_sql(tok_col, n))
    return _flat_span_hashes(tok_col, n)


def _flat_span_hashes_sql(col_name: str, n: int) -> str:
    """SQL-string twin of :func:`_flat_span_hashes` over a NAMED
    column — same tree after parsing (int literal arithmetic,
    element_at indexing, whole-array fallback)."""
    c = f"`{col_name}`"
    args = ", ".join(f"element_at({c}, i + {j + 1})" for j in range(n))
    return (
        f"case when size({c}) >= {n} then "
        f"transform(sequence(0, size({c}) - {n}), i -> xxhash64({args})) "
        f"else array(xxhash64({c})) end"
    )


def _dup_fraction(arr) -> Column:
    """(size - distinct size) / size over a BOUND array (see
    bind_once — the caller's array expression must evaluate once)."""

    def _frac(a):
        n = F.size(a)
        return F.when(n > 0, (n - F.size(F.array_distinct(a))) / n).otherwise(F.lit(0.0))

    return bind_once(arr, _frac)


def dup_line_fraction(col) -> Column:
    """Gopher-style repetition signal: fraction of a document's lines
    that are repeats of an earlier line (0 for single-line docs).
    Pure array expressions — codegen'd, no shuffle, no UDF."""
    return _dup_fraction(F.filter(F.split(col, r"\n"), lambda x: F.trim(x) != ""))


def dup_ngram_fraction(col, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    — high values flag boilerplate / template spam documents.

    Counts distinct xxhash64 span digests with the same span
    boundaries as :func:`shingles` (including the short-doc fallback)
    instead of building per-position n-gram STRINGS only to throw
    them away after the distinct count. The digest is the FLAT
    n-argument ``xxhash64(tok_i, ..., tok_{i+n-1})`` — argument
    lengths feed the hash stream, so ("ab","c") ≠ ("a","bc") — NOT
    ``xxhash64`` over a sliced sub-ARRAY: the array overload drops
    out of whole-stage codegen and measured 4.7x SLOWER than the
    string build at sf10, while the flat form is codegen'd and wins
    at every scale (sf0.1 0.58 -> 0.41 s; sf10 2.5 -> 1.5 s
    in-session). Digest identity is the span_hashes/dedup-family
    contract (r8 ADVICE): the fraction differs from the
    string-shingle count only on an intra-document collision
    (~n_spans²/2⁶⁵ per doc); verified value-identical on the sf0.001/
    sf0.01/sf0.1 and generated sf10 fixtures."""
    return _dup_fraction(span_hashes(col, n))


def repetition_sql(col: str, n: int = 2) -> dict[str, str]:
    """DuckDB-SQL twins of the two repetition measures (same line
    filter, same shingle construction)."""
    lines = rf"list_filter(string_split({col}, chr(10)), x -> trim(x) <> '')"
    toks = rf"regexp_split_to_array(trim(lower({col})), '\s+')"
    sh = (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"[array_to_string({toks}[i+1:i+{n}], ' ') for i in range(0, len({toks}) - {n} + 1)] "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )
    return {
        "dup_line_frac": (
            f"CASE WHEN len({lines}) > 0 THEN "
            f"(len({lines}) - len(list_distinct({lines}))) / len({lines}) ELSE 0.0 END"
        ),
        "dup_ngram_frac": (
            f"CASE WHEN len({sh}) > 0 THEN "
            f"(len({sh}) - len(list_distinct({sh}))) / len({sh}) ELSE 0.0 END"
        ),
    }


# PII patterns: valid in BOTH Java regex (Spark) and RE2 (DuckDB) —
# no backreferences, no lookaround.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def pii_scrub(col) -> Column:
    """Replace common PII shapes (email, NANP phone, IPv4, SSN) with
    typed placeholder tokens — the redaction pass of a training-data
    pipeline. Chained JVM regexp_replace, order matters (emails first
    so their digits are not later misread as phones)."""
    out = col if isinstance(col, Column) else F.col(col)
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub_sql(col: str) -> str:
    """DuckDB twin of :func:`pii_scrub` (same patterns, same order)."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def chunk_text_udtf(chunk_tokens: int = 10):
    """Python UDTF (Spark 4 table function API) splitting a document
    into fixed token-count chunks with ordinals — the context-window
    chunking step of a RAG / training pipeline.

    Row-at-a-time Python is deliberately acceptable here: this is the
    API-coverage demo for UDTFs (the reference has no function surface
    at all, SURVEY.md §2B "UDF/UDAF/UDTF: none"). The JVM-side
    equivalent for the hot path is posexplode over a sequence-sliced
    token array (same output, whole-stage codegen)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, chunk string")
    class ChunkText:
        def eval(self, text: str):
            toks = (text or "").split()
            for i in range(0, len(toks), chunk_tokens):
                yield i // chunk_tokens + 1, " ".join(toks[i : i + chunk_tokens])

    return ChunkText


def chunk_text_builtin(col, chunk_tokens: int = 10):
    """JVM fast-path twin of :func:`chunk_text_udtf`: returns an
    array<struct<chunk_no,chunk>> to posexplode — identical rows, no
    Python in the plan. Tokens bound once (bind_once): slicing an
    INLINED split() per chunk would re-tokenize the document
    len/chunk_tokens times."""
    return chunk_tokens_builtin(tokens(col), chunk_tokens)


def chunk_tokens_builtin(tok_col, chunk_tokens: int = 10):
    """:func:`chunk_text_builtin` over an ALREADY-tokenized
    array<string> column (a pre-tokenized layout projection skips the
    regex split — the dominant scan kernel of segment-level ops at
    scale). Identical output for ``tok_col = split(trim(col), '\\s+')``."""

    def _chunks(tb):
        n_chunks = F.ceil(F.size(tb) / F.lit(chunk_tokens)).cast("int")
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
            lambda i: F.struct(
                i.cast("int").alias("chunk_no"),
                F.concat_ws(" ", F.slice(tb, (i - 1) * chunk_tokens + 1, chunk_tokens)).alias("chunk"),
            ),
        )

    return bind_once(tok_col, _chunks)
