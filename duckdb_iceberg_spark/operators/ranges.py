"""Interval / range joins — another operator family Spark plans badly
by default (inequality predicates become BroadcastNestedLoopJoin or a
cross product).

The scalable formulation: quantize the join dimension into buckets of
width ``granularity``; an interval [s, e] is exploded to one row per
bucket it overlaps, points map to their bucket, and the join becomes a
plain equi-join on (key, bucket) followed by the exact predicate.
Candidate count is O(points + intervals x avg_span/granularity) —
tunable, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_seconds(df: DataFrame, colname: str) -> Column:
    """Column as epoch-seconds double regardless of physical type.

    TIMESTAMP_NTZ rejects numeric casts in Spark 4, so it is routed
    through a session-TZ timestamp first (sessions here pin UTC, so
    the instant is unchanged); numerics cast directly."""
    col = df[colname]
    if dict(df.dtypes).get(colname) == "timestamp_ntz":
        col = col.cast("timestamp")
    return col.cast("double")


def _bucket(col: Column, granularity: int) -> Column:
    return F.floor(col / F.lit(float(granularity))).cast("long")


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    granularity: int | None = 3600,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (and equal ``key`` when given).

    Works on numeric or timestamp columns (timestamps are compared on
    epoch seconds for bucketing; the exact predicate uses the original
    values).

    ``granularity=None`` (requires ``key``) skips the time-bucket
    blocking and joins on the key alone with the range predicate as a
    post-filter. Right choice when the key is selective (bounded rows
    per key) and the tables are co-located on it — on a key-bucketed
    layout it compiles to a shuffle-free hash join (sf10: 1.56 ->
    0.71 s, zero Exchanges). Keep the bucketized path when there is no
    key or single keys can be hot (the per-key cross product is what
    bucketing bounds)."""
    if granularity is None:
        if not key:
            raise ValueError("granularity=None requires a join key")
        iv = intervals.hint("SHUFFLE_HASH")
        joined = points.join(iv, points[key] == iv[key])
        exact = (iv[start_col] <= points[point_col]) & (points[point_col] < iv[end_col])
        return joined.where(exact).drop(iv[key])
    p = points.withColumn("__b", _bucket(_as_seconds(points, point_col), granularity))
    spans = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(_as_seconds(intervals, start_col), granularity),
                _bucket(_as_seconds(intervals, end_col), granularity),
            )
        ),
    )
    on = [p["__b"] == spans["__b"]]
    if key:
        on.append(p[key] == spans[key])
    joined = p.join(spans, on[0] if len(on) == 1 else (on[0] & on[1]))
    exact = (spans[start_col] <= p[point_col]) & (p[point_col] < spans[end_col])
    out = joined.where(exact)
    drop = [spans["__b"], p["__b"]] + ([spans[key]] if key else [])
    for c in drop:
        out = out.drop(c)
    return out
