"""Time-series operators over the events table.

EWMA is the canonical "iterative per-key recurrence" Spark's built-in
window functions can't express directly (state folds across rows).
The scalable shape is ONE shuffle on the key, then a PARTITION-level
``mapInPandas`` over (key, ts)-sorted input — each Arrow batch holds
many keys and the recurrence runs as a vectorized pandas
groupby().ewm(); per-key state never exceeds one group's rows. (A
grouped applyInPandas is semantically identical but pays one Arrow
round-trip per key — with millions of small keys that overhead IS the
runtime.)

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

    # Partition-level recurrence, not per-group: hash-repartition on
    # the key, sort (key, ts) inside each partition, then ONE
    # Arrow-batched mapInPandas per partition with pandas'
    # vectorized groupby().ewm(). A grouped applyInPandas here makes
    # one Arrow round-trip per USER — at sf10 that is ~100k
    # sub-millisecond pandas frames and the per-group overhead is the
    # whole runtime (measured 33 s -> 12 s). Because a user's rows can
    # straddle adjacent Arrow batches, the last (possibly incomplete)
    # key group of each batch is carried into the next one; per-key
    # state is one group's rows, the same bound the exact recurrence
    # needs anywhere.
    def fold(batches):
        tail = None
        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_key = pdf[key].iloc[-1]
            done = pdf[pdf[key] != last_key]
            tail = pdf[pdf[key] == last_key]
            if len(done):
                done = done.copy()
                done[out_col] = (
                    done.groupby(key, sort=False)[value]
                    .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
                )
                yield done[[key, ts, value, out_col]]
        if tail is not None and len(tail):
            tail = tail.copy()
            tail[out_col] = tail[value].ewm(alpha=alpha, adjust=False).mean()
            yield tail[[key, ts, value, out_col]]

    return (
        df.select(
            F.col(key).cast("long"),
            F.col(ts),
            F.col(value).cast("double"),
        )
        .repartition(key)
        .sortWithinPartitions(key, ts)
        .mapInPandas(fold, schema)
    )


def ewma_fixed_point(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    out_col: str = "ewma",
    out_decimals: int = 4,
) -> DataFrame:
    """Per-key EWMA (alpha = 0.3) as an EXACT fixed-point recurrence
    for non-negative 2-decimal inputs — every step is integer
    arithmetic, so the result is bit-reproducible across engines with
    no epsilon anywhere:

        X_i = round(value_i * 100)            (cents, int64)
        M_0 = X_0 * 10^4                      (micro-units)
        M_i = (7*M_{i-1} + 3*X_i*10^4 + 5) // 10   (round-half-up)
        out = ((M_i + 50) // 100) / 10^4      (for out_decimals=4)

    Each step re-rounds to the nearest micro-unit, so state never
    grows (the un-rounded exact recurrence needs 7^i-scale numerators
    — unrepresentable), and the final division of one exact int64 by
    a power of ten is IEEE-deterministic on any engine.

    Same single-shuffle partition-level scale shape as :func:`ewma`;
    the recurrence is vectorized ACROSS keys by depth (rows are
    (key, ts)-sorted and contiguous, so each row's predecessor is the
    previous row): iteration k updates every key's k-th row in one
    numpy step — per-batch work is O(rows) with ~max-group-depth numpy
    calls, no per-row Python loop.
    """
    import numpy as np
    import pandas as pd

    schema = f"{key} long, {ts} timestamp, {value} double, {out_col} double"
    qdiv = 10 ** (6 - out_decimals)
    qhalf = qdiv // 2
    qden = float(10**out_decimals)

    def fold(batches):
        tail = None

        def run(pdf):
            xm = (pdf[value].to_numpy() * 100).round().astype(np.int64) * 10000
            # group ranks straight from the sorted key array — a
            # pandas groupby().cumcount() here cost ~10% of the whole
            # query at sf0.1 (hash-bucketing keys the sort already
            # grouped); diff/repeat over the contiguous runs is pure
            # vectorized numpy
            keys = pdf[key].to_numpy()
            n = len(keys)
            newgrp = np.empty(n, dtype=bool)
            newgrp[0] = True
            np.not_equal(keys[1:], keys[:-1], out=newgrp[1:])
            starts = np.flatnonzero(newgrp)
            counts = np.diff(np.append(starts, n))
            rank = np.arange(n) - np.repeat(starts, counts)
            m = xm.copy()
            # depth-frontier propagation: iteration k advances only
            # the rows whose group continues to depth k (each row is
            # touched exactly once — O(rows) total, vs the old
            # flatnonzero(rank == k) full scan per depth, O(rows x
            # max-depth))
            sel = np.flatnonzero(rank == 1)
            k = 1
            while len(sel):
                m[sel] = (7 * m[sel - 1] + 3 * xm[sel] + 5) // 10
                k += 1
                sel = sel[rank[np.minimum(sel + 1, n - 1)] == k] + 1
                sel = sel[sel < n]
            out = pdf[[key, ts, value]].copy()
            out[out_col] = ((m + qhalf) // qdiv) / qden
            return out

        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_key = pdf[key].iloc[-1]
            done = pdf[pdf[key] != last_key]
            tail = pdf[pdf[key] == last_key]
            if len(done):
                yield run(done)
        if tail is not None and len(tail):
            yield run(tail)

    return (
        df.select(
            F.col(key).cast("long"),
            F.col(ts),
            F.col(value).cast("double"),
        )
        .repartition(key)
        .sortWithinPartitions(key, ts)
        .mapInPandas(fold, schema)
    )


def resample(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    interval_sec: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """Resample an irregular series onto a fixed grid with
    last-observation-carried-forward gap filling.

    Per key: bucket timestamps to `interval_sec`, keep the LAST value
    per bucket (by event time), densify to every grid point between
    the key's first and last bucket (sequence + explode — generated
    JVM-side, no driver loop), and forward-fill empty buckets with
    the window `last(value, ignorenulls=True)`.

    Returns (key, bucket_ts, value, is_gap).

    Scale shape — exactly TWO exchanges, no join: (1) the per-bucket
    last value is a ``max_by`` hash aggregation on (key, bucket)
    (partial map-side combine, unlike a row_number window); (2) one
    window on the key computes each observed bucket's successor, and
    the gap buckets up to it are GENERATED from the observed row
    itself (sequence + posexplode) — which carries its value, so LOCF
    needs no second window and the grid never exists as a separate
    relation to join back. Grid rows are at most span/interval per
    key and never materialize globally; nothing touches the driver.
    """
    # SQL-string projections: one parse round trip each instead of a
    # gateway call per sub-expression (§7.3); trees identical to the
    # builder forms (same casts, same max_by ordering struct).
    t_sql = f"`{ts}`"
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        # TIMESTAMP_NTZ rejects numeric casts; go through the
        # (UTC-pinned) session-TZ timestamp first.
        t_sql = f"CAST(`{ts}` AS timestamp)"
    ord_sql = (
        f"struct(`{ts}`, `{tiebreak}`)" if tiebreak else f"struct(`{ts}`)"
    )
    per_bucket = (
        df.selectExpr(
            f"`{key}`",
            f"CAST(floor(CAST({t_sql} AS long) / {interval_sec}) * "
            f"{interval_sec} AS long) AS b",
            f"{ord_sql} AS o",
            f"CAST(`{value}` AS double) AS v",
        )
        .groupBy(key, "b")
        .agg(F.expr("max_by(v, o) AS v"))
    )
    lead = f"lead(b) OVER (PARTITION BY `{key}` ORDER BY b)"
    return per_bucket.selectExpr(
        f"`{key}`",
        "b",
        "v",
        f"sequence(b, coalesce({lead} - {interval_sec}, b), "
        f"{interval_sec}) AS gb",
    ).selectExpr(
        f"`{key}`", "v", "posexplode(gb) AS (pos, b)"
    ).selectExpr(
        f"`{key}`",
        "CAST(b AS timestamp) AS bucket_ts",
        f"v AS `{value}`",
        "(pos > 0) AS is_gap",
    )
