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


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "42",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(seed:key) maps
    each key to [0,100) and range boundaries assign the split.
    Per-row expression — no shuffle, no RNG state, reproducible across
    engines/runs/cluster sizes, and stable under data growth (a key's
    split never changes when other rows arrive — the property random()
    splits lack).

    ``splits``: {"train": 0.9, "val": 0.05, "test": 0.05} (sums to 1).
    """
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    # engine-portable bucketing: the first 4 hex chars of the md5 are
    # uniform over 0x0000-0xffff, and fixed-width lowercase hex
    # compares identically as a STRING in every engine — no hex->int
    # cast (whose syntax differs) anywhere.
    prefix = F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))), 1, 4)
    expr = None
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        hi = format(min(int(round(acc * 65536)), 65536) - 1, "04x")
        cond = prefix <= F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def hash_split_sql(key_col: str, splits: dict[str, float], seed: str = "42") -> str:
    """DuckDB twin of :func:`hash_split`'s assignment expression."""
    prefix = f"substring(md5(concat_ws(':', '{seed}', CAST({key_col} AS VARCHAR))), 1, 4)"
    expr = "NULL"
    acc = 0.0
    clauses = []
    for name, frac in splits.items():
        acc += frac
        clauses.append((name, format(min(int(round(acc * 65536)), 65536) - 1, "04x")))
    for name, hi in reversed(clauses):
        expr = f"CASE WHEN {prefix} <= '{hi}' THEN '{name}' ELSE {expr} END"
    return expr


def shuffle_deterministic(df: DataFrame, key_col: str, seed: str = "42") -> DataFrame:
    """Deterministic global shuffle for training-data ordering:
    sort by md5(seed:key) — a pseudorandom permutation that is
    reproducible across runs and engines (no RNG, no collect).
    At scale this is one range-partitioned sort, the same cost as any
    global ORDER BY; change the seed to get a fresh epoch order."""
    return df.orderBy(F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))))


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


def sample_to_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    rates: dict[str, float],
    seed: str = "42",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-domain downsampling to a target mixture: keep each row with
    its domain's rate, decided by md5(seed:key) — the training-mixture
    rebalance step of a data pipeline (e.g. 100% books, 10% web).

    Same engine-portable determinism as :func:`hash_split`: a row's
    keep/drop never changes when other rows arrive, across runs,
    engines, and cluster sizes. Per-row expression, no shuffle, no
    RNG state; at 100 TB this is a scan-speed filter.
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {d!r} must be in [0,1], got {r}")
    prefix = F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))), 1, 4)

    def hi(rate: float) -> str:
        return format(min(int(round(rate * 65536)), 65536) - 1, "04x")

    expr = None
    for d, r in rates.items():
        cond = F.col(domain_col) == d
        expr = F.when(cond, F.lit(hi(r))) if expr is None else expr.when(cond, F.lit(hi(r)))
    cutoff = expr.otherwise(F.lit(hi(default_rate))) if expr is not None else F.lit(hi(default_rate))
    return df.filter(prefix <= cutoff)


def sample_to_mixture_sql(
    domain_col: str, key_col: str, rates: dict[str, float], seed: str = "42", default_rate: float = 1.0
) -> str:
    """DuckDB twin of :func:`sample_to_mixture`'s keep predicate."""
    prefix = f"substring(md5(concat_ws(':', '{seed}', CAST({key_col} AS VARCHAR))), 1, 4)"

    def hi(rate: float) -> str:
        return format(min(int(round(rate * 65536)), 65536) - 1, "04x")

    cutoff = f"'{hi(default_rate)}'"
    for d, r in reversed(list(rates.items())):
        cutoff = f"CASE WHEN {domain_col} = '{d}' THEN '{hi(r)}' ELSE {cutoff} END"
    return f"{prefix} <= {cutoff}"


def cluster_balanced_sample(
    df: DataFrame,
    cluster_col: str,
    key_col: str,
    n_per_cluster: int,
    seed: str = "42",
) -> DataFrame:
    """Diversity sampling: keep at most ``n_per_cluster`` rows from
    each cluster, chosen by a deterministic md5 rank within the
    cluster — the semantic-rebalance step of a curation pipeline
    (cap boilerplate-heavy clusters so near-identical documents don't
    dominate the training mixture; pair with
    :func:`~..operators.similarity.ivf_build` centroids or
    :func:`~..functions.vectors.sign_bits` buckets as the cluster key).

    Deterministic like the rest of this module: the kept set depends
    only on (cluster, key, seed), never on partitioning, task order,
    or RNG state. One shuffle on the cluster key; at 100 TB the
    per-cluster rank is a bounded-memory window (no global sort), and
    clusters are processed independently so skewed clusters parallelize
    across their window partitions' spill path rather than the job.
    """
    if n_per_cluster < 1:
        raise ValueError("n_per_cluster must be >= 1")
    rank_key = F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string")))
    w = Window.partitionBy(cluster_col).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_cluster)
        .drop("__rk")
    )


def cluster_balanced_sample_sql(
    cluster_col: str, key_col: str, n_per_cluster: int, seed: str = "42"
) -> str:
    """DuckDB twin of :func:`cluster_balanced_sample` (QUALIFY form):
    append to a SELECT over the same input relation."""
    rank = (
        f"ROW_NUMBER() OVER (PARTITION BY {cluster_col} ORDER BY "
        f"md5(concat_ws(':', '{seed}', CAST({key_col} AS VARCHAR))), {key_col})"
    )
    return f"QUALIFY {rank} <= {n_per_cluster}"


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    strata: list[str] | None = None,
    seed: str = "42",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the
    ``k`` rows (per stratum) with the smallest priority ``u / w`` —
    sequential Poisson / priority sampling (Ohlsson 1998; Duffield et
    al.'s priority sampling), the scheme production pipelines use to
    length- or quality-weight a sample: inclusion probability grows
    ~proportionally with ``weight_col``.

    Engine-portable exactness, same policy as the rest of this module:
    ``u`` is the first 48 bits of md5(seed:key) — an EXACT integer in
    a double — and the priority is one IEEE division, so Spark and a
    SQL oracle compute bit-identical keys (no libm transcendentals;
    the textbook u^(1/w) exponential-key form would need log(), which
    is not correctly-rounded across engines). Ties break on the key
    column. One shuffle on the strata; the per-stratum rank is a
    bounded window, never a global sort. Rows with weight <= 0 are
    excluded (zero weight = zero inclusion probability).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    prio = u.cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(*(strata or [F.lit(1)])).orderBy(prio, F.col(key_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__prio", prio)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__prio")
    )


def weighted_priority_sample_sql(
    weight_col: str, key_col: str, k: int, strata: list[str] | None = None, seed: str = "42"
) -> str:
    """DuckDB twin of :func:`weighted_priority_sample` (QUALIFY form,
    to append to a SELECT over the same relation pre-filtered on
    ``weight_col > 0``)."""
    u = (
        f"CAST(concat('0x', substring(md5(concat_ws(':', '{seed}', "
        f"CAST({key_col} AS VARCHAR))), 1, 12)) AS BIGINT)"
    )
    part = ", ".join(strata) if strata else "1"
    rank = (
        f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY "
        f"CAST({u} AS DOUBLE) / CAST({weight_col} AS DOUBLE), {key_col})"
    )
    return f"QUALIFY {rank} <= {k}"
