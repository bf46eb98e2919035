"""As-of (most-recent-value) joins — an operator Spark lacks natively.

The naive formulation is a range join (``l.ts >= r.ts`` then keep the
max) whose cross-product blows up on hot keys. The scalable
formulation used here is UNION + LAST_VALUE: tag both sides, union
them, and carry the most recent right-side values forward with a
``last(..., ignorenulls=True)`` window — one shuffle on (key, ts),
no quadratic candidate set, works unchanged at 100 TB.

DuckDB implements ASOF JOIN natively, which makes a bit-exact oracle
for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` for the same ``key`` (direction
    'backward'; 'forward' = smallest ``right.ts >= left.ts``).

    Returns left columns + right value columns (suffixed) + the
    matched right timestamp as ``{ts}{suffix}``; unmatched left rows
    keep NULLs (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = [c for c in right.columns if c not in (key, ts)]

    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(dict(right.dtypes)[ts]).alias("__r_ts"),
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(ts).alias("__r_ts"),
    )
    u = lhs.unionByName(rhs)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts so ties match
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__is_l").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").desc(), F.col("__is_l").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = u.select(
        "__is_l",
        "__lrow",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}") for c in rcols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    ).where(F.col("__is_l") == 1)
    return carried.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in rcols],
        F.col("__c_ts").alias(f"{ts}{suffix}"),
    )
