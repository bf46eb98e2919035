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


def _bucket(col: Column, granularity: int) -> Column:
    return F.floor(col.cast("double") / F.lit(float(granularity))).cast("long")


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    granularity: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (and equal ``key`` when given).

    Works on numeric or timestamp columns (timestamps are compared on
    epoch seconds for bucketing; the exact predicate uses the original
    values)."""
    p = points.withColumn("__b", _bucket(F.col(point_col), granularity))
    spans = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), granularity),
                _bucket(F.col(end_col), granularity),
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
