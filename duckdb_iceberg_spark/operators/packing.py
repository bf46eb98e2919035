"""Sequence packing: assign documents to contiguous token-budget
shards for LLM training-data preparation.

Beyond-reference (north-star) operator: the reference
(duckdb/duckdb_iceberg) has no pipeline surface at all — it inherits
all relational work from the host engine (see SURVEY.md §0). This is
the Spark-native shard assignment a 100 TB curation job needs before
writing tokenized training shards.

Scale notes
-----------
- The running sum is a window per stratum (e.g. language, source
  bucket). With `strata` set, each stratum sorts independently —
  Spark range-partitions within `partitionBy`, so no single-machine
  sort at 100 TB. An un-stratified call is a single global ordered
  window (one partition!) and is only for small tables; callers at
  scale must stratify (that is also what you want semantically:
  shards are homogeneous per language/source).
- Shard ids are deterministic functions of (stratum, order key,
  token counts): retries and speculative tasks can't disagree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    strata: list[str] | None = None,
    out_col: str = "shard_id",
) -> DataFrame:
    """Greedy contiguous packing: walk documents in `order_col` order
    and start a new shard each time the running token total crosses a
    multiple of `budget`. A document whose prefix-sum starts in shard
    k belongs to shard k (documents are never split).

    `shard_id = floor((prefix_sum - own_tokens) / budget)` — the
    closed form of the greedy walk, computable as ONE window
    aggregation (no iteration, no UDF).
    """
    base = Window.partitionBy(*strata) if strata else Window.partitionBy()
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        out_col,
        F.floor((cum - F.col(token_col)) / F.lit(float(budget))).cast("long"),
    )


def pack_sql(token_expr: str, order_col: str, budget: int, stratum: str) -> str:
    """DuckDB-SQL twin of :func:`pack_sequences` for oracle checks."""
    return (
        f"CAST(FLOOR((SUM({token_expr}) OVER (PARTITION BY {stratum} ORDER BY {order_col} "
        f"ROWS UNBOUNDED PRECEDING) - {token_expr}) / {budget}.0) AS BIGINT)"
    )
