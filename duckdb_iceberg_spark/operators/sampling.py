"""Deterministic sampling for training-data curation.

Beyond-reference (north-star) operator — the reference has no
sampling surface; DuckDB's own `USING SAMPLE` is nondeterministic
across engines, so these are built to be bit-reproducible between
Spark and any SQL oracle.

Two shapes:
- :func:`every_kth` — stratified systematic sampling (row_number per
  stratum, keep every k-th). Exact per-stratum rate, one shuffle.
- plain modulo sampling needs no helper: `df.filter((col % 100) < p)`
  is deterministic, shuffle-free, and pushed down to the scan —
  prefer it at 100 TB when the key is uniformly distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def every_kth(
    df: DataFrame,
    key_col: str,
    k: int,
    strata: list[str] | None = None,
) -> DataFrame:
    """Keep rows ranked 1, k+1, 2k+1, ... per stratum when ordered by
    `key_col` — an exact 1/k systematic sample, reproducible anywhere
    (`row_number` over a total order; no RNG)."""
    base = Window.partitionBy(*strata) if strata else Window.partitionBy()
    w = base.orderBy(key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % k == 0)
        .drop("_rn")
    )
