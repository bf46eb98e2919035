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

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tune_n_salts(
    big: DataFrame,
    on: str,
    sample_fraction: float = 0.01,
    max_salts: int = 64,
    seed: int = 42,
) -> int:
    """Derive the salt fan-out from the data instead of guessing.

    One cheap pass: sample the key column (scan-side Bernoulli sample,
    no count needed), aggregate per-key counts over the sample (a
    shuffle over ~sample_fraction of one column), and estimate the hot
    key's share of rows. The hot key lands share*total rows on one
    task; spreading it back to an average task's size needs
    ``ceil(share * shuffle.partitions)`` salts. Uniform data tunes to
    1 — salting (and the small-side explode) is skipped entirely.
    """
    parallelism = int(big.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    agg = (
        big.select(on)
        .sample(fraction=sample_fraction, seed=seed)
        .groupBy(on)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .first()
    )
    if agg is None or not agg["tot"]:
        return 1
    share = agg["mx"] / agg["tot"]
    return max(1, min(max_salts, math.ceil(share * parallelism)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: Optional[int] = None,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small ON on`` with the hot-key skew spread
    across ``n_salts`` tasks. Result == plain join (verified in tests);
    only the physical distribution changes.

    ``n_salts=None`` (default) tunes the fan-out from a key-column
    sample via :func:`tune_n_salts`: heavy skew gets a wide spread,
    uniform data gets 1 — which skips the salt columns and the
    small-side replication altogether, so auto mode costs nothing on
    well-distributed keys.

    The salt on the big side is deterministic per row (hash of all
    columns + seed) so retried tasks produce identical output —
    required for exactly-once semantics under task retry.
    """
    if n_salts is None:
        n_salts = tune_n_salts(big, on, seed=seed)
    if n_salts <= 1:
        return big.join(small, on, how)
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
