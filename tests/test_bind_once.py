"""Direct guard for :func:`functions.text.bind_once` — the
1-element-array-transform let-binding every shingle/chunk/quantize
path depends on.

Catalyst neither let-binds nor CSEs inside higher-order-function
lambdas; bind_once is what keeps those paths linear. If a Spark
upgrade starts inlining through ``transform``, these tests fail
LOUDLY instead of the operators silently going quadratic (the sf10
regression class fixed in round 4).

Evaluation counts are observed with a NONDETERMINISTIC Python UDF
bumping an accumulator — nondeterminism forbids Catalyst from CSE-ing
or constant-folding the call, so the count measures exactly how many
times the bound expression is evaluated.
"""

from pyspark.sql import functions as F

from duckdb_iceberg_spark.functions import text as TX


def _counting_udf(spark):
    calls = spark.sparkContext.accumulator(0)

    def bump(s):
        calls.add(1)
        return s

    return F.udf(bump).asNondeterministic(), calls


def test_bind_once_evaluates_expr_exactly_once_per_row(spark):
    u, calls = _counting_udf(spark)
    df = spark.range(4).select(F.concat(F.lit("r"), F.col("id")).alias("t"))
    # the bound variable is referenced 3 times inside the lambda
    df.select(TX.bind_once(u(F.col("t")), lambda b: F.concat(b, b, b))).collect()
    assert calls.value == 4  # once per row, NOT 3x per row


def test_naive_inlining_would_be_caught(spark):
    """The failure mode the guard exists for: the same 3-reference
    lambda with the expression inlined evaluates it 3x per row. If
    this ever starts returning n_rows, Catalyst learned CSE over
    nondeterministic exprs and the counting methodology (not
    bind_once) needs revisiting."""
    u, calls = _counting_udf(spark)
    df = spark.range(4).select(F.concat(F.lit("r"), F.col("id")).alias("t"))
    e = u(F.col("t"))
    df.select(F.concat(e, e, e)).collect()
    assert calls.value == 12


def test_shingles_tokenize_once_per_row(spark):
    """End-to-end through a real consumer: 3-gram shingling of a
    9-token document indexes the token array ~3x per shingle — the
    tokenization feeding it must still run once per row."""
    u, calls = _counting_udf(spark)
    df = spark.range(2).select(F.lit("a b c d e f g h i").alias("t"))
    out = df.select(TX.shingles(u(F.col("t")), 3).alias("s")).collect()
    assert calls.value == 2  # once per row despite ~21 array references
    assert out[0]["s"][0] == "a b c"
    assert len(out[0]["s"]) == 7
