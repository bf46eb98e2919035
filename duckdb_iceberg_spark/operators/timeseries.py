"""Time-series operators over the events table.

EWMA is the canonical "iterative per-key recurrence" Spark's built-in
window functions can't express directly (state folds across rows).
The scalable shape is ``applyInPandas``: one shuffle on the key, then
each group's recurrence runs vectorized in Arrow batches — no state
larger than a group ever materializes anywhere.

For the oracle there is a closed form: with gap-independent alpha,
    ewma_i = (1-a)^i * x_0 + a * sum_{j<=i} (1-a)^(i-j) x_j
which DuckDB reproduces with window sums of scaled terms (numerically
touchy for long series — the entry restricts to bounded-length groups
and rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average ordered by ts.

    Returns (key, ts, value, ewma) with
    ``ewma_0 = x_0; ewma_i = alpha*x_i + (1-alpha)*ewma_{i-1}``.
    """
    import pandas as pd

    schema = f"{key} long, {ts} timestamp, {value} double, {out_col} double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts]).reset_index(drop=True)
        pdf[out_col] = pdf[value].ewm(alpha=alpha, adjust=False).mean()
        return pdf[[key, ts, value, out_col]]

    return (
        df.select(
            F.col(key).cast("long"),
            F.col(ts),
            F.col(value).cast("double"),
        )
        .groupBy(key)
        .applyInPandas(fold, schema)
    )
