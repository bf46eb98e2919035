"""Skew-resilient joins via key salting.

AQE's skew-join splitting (on in `session.py`) handles most cases at
runtime, but only for sort-merge joins and only per-partition. Salting
is the explicit tool when one hot key dominates (the classic 100 TB
failure mode: one user/null key holding 10% of rows lands on one task):

- the BIG side gets a uniform random salt in [0, n_salts);
- the SMALL side is replicated n_salts times (explode over a literal
  range — rows × n_salts, acceptable for a dimension side);
- join on (key, salt): the hot key now spreads over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small ON on`` with the hot-key skew spread
    across ``n_salts`` tasks. Result == plain join (verified in tests);
    only the physical distribution changes.

    The salt on the big side is deterministic per row (hash of all
    columns + seed) so retried tasks produce identical output —
    required for exactly-once semantics under task retry.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(seed)), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def skew_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key row counts + share of total for the heaviest keys —
    the diagnostic you run before deciding to salt."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(total), 4))
        .orderBy(F.desc("n"))
        .limit(top)
    )
