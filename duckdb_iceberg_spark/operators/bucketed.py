"""Bucketed (co-located) joins: pre-shuffle once at write time, join
shuffle-free forever after.

At 100 TB the dominant join cost is the exchange of the fact table.
Spark's bucketed tables (`bucketBy(N, key).sortBy(key)`) persist the
hash partitioning in the catalog, so a join of two tables bucketed by
the same key with the same N compiles to a SortMergeJoin with NO
Exchange on either side — the physical realization of "co-located
join" (the Iceberg equivalent is the `bucket[N]` partition transform,
implemented in plans/transforms.py with identical murmur3 hashing).

`tests/test_plan_shapes.py::test_bucketed_join_no_exchange` asserts
the exchange-free plan.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    write_options: dict[str, str] | None = None,
    pre_partitioned: bool = False,
    partition_by: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed+sorted catalog table (external, under
    `path`), replacing any previous definition.

    ``sort_cols`` defaults to the bucket key (co-located SortMergeJoin
    needs in-bucket key order). Passing a DIFFERENT column (e.g. a date)
    turns the in-bucket sort into a zone map: parquet row-group min/max
    statistics on that column become tight, so range filters prune whole
    row groups — hash co-location on ``key`` is unaffected (only the
    sortedness metadata changes, which hash aggregation and hash joins
    never consume). Pair with ``write_options={'parquet.block.size': ...}``
    to control pruning granularity."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = path or tempfile.mkdtemp(prefix=f"bucketed_{table}_")
    # repartition(N, key) is the SAME HashPartitioning
    # (pmod(murmur3(key), N)) bucketBy assigns, so each write task
    # holds exactly one bucket and every bucket lands as ONE file.
    # Without it each of the W input tasks writes a sliver of all N
    # buckets — N*W files (1024 at sf10), and every downstream scan
    # pays W× the footer/open overhead for identical bytes.
    # ``pre_partitioned=True`` asserts the caller's plan ALREADY
    # carries that partitioning (e.g. an exchange-free SortMergeJoin of
    # two tables bucketed on ``key`` with the same N) and skips the
    # redundant full-table shuffle — at sf100 that is ~15 GB of
    # shuffle/spill disk the write never needs.
    if not pre_partitioned:
        df = df.repartition(num_buckets, key)
    w = df.write.mode("overwrite").options(**(write_options or {})).option("path", loc)
    if partition_by:
        # Hive-style directory partitioning ON TOP of bucketing (the
        # event-log shape: PARTITIONED BY type/date, CLUSTERED BY the
        # join key). Each write task holds one user-bucket across all
        # partition values -> exactly one file per (partition, bucket).
        w = w.partitionBy(*partition_by)
    (
        w.bucketBy(num_buckets, key)
        .sortBy(*(sort_cols or [key]))
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_buckets: int = 8,
    names: tuple[str, str] = ("bucketed_left", "bucketed_right"),
) -> DataFrame:
    """Bucket both sides on their join keys and return the co-located
    join. The write is the one-time shuffle; every subsequent join on
    the bucket key is exchange-free."""
    write_bucketed(left, names[0], left_key, num_buckets)
    write_bucketed(right, names[1], right_key, num_buckets)
    lt, rt = spark.table(names[0]), spark.table(names[1])
    return lt.join(rt, lt[left_key] == rt[right_key])
