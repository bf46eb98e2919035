"""Similarity search over embedding columns (array<float>).

Two paths, mirroring how ANN works on a real cluster:

- :func:`cosine_topk` — brute force: one JVM-side cosine per row, a
  single top-k (TakeOrderedAndProject — no full sort, no shuffle of
  the data, only k rows to the driver). The correctness baseline, and
  at 100 TB still embarrassingly parallel.
- :func:`lsh_topk` — random-hyperplane LSH with multiprobe: only
  buckets within ``probe_hamming`` of the query's bucket are scanned,
  turning a full scan into a partition-pruned scan when the bucket key
  is a partition/cluster column.
- :func:`knn_join` — batched k-NN: every left row gets its k nearest
  right rows, blocked by LSH bucket to avoid the cross product.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as VEC


def _planes(n_planes: int, dim: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Returns (key_col, cos) — k rows, deterministic tie-break on key.
    """
    q = VEC.lit_vector(query_vec)
    scored = df.select(key_col, F.round(VEC.cosine(F.col(vec_col), q), 4).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.asc(key_col)).limit(k)


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_planes: int = 6,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only LSH buckets within
    ``probe_hamming`` bit flips of the query's bucket (multiprobe)."""
    dim = len(query_vec)
    planes = _planes(n_planes, dim, seed)
    import numpy as np

    qbits = "".join("1" if float(np.dot(p, list(query_vec))) >= 0 else "0" for p in planes)
    keyed = df.select(key_col, vec_col, VEC.sign_bits(F.col(vec_col), planes).alias("bucket"))
    # buckets within hamming distance: enumerate on the driver (tiny)
    def flips(bits: str, d: int):
        out = {bits}
        if d >= 1:
            for i in range(len(bits)):
                out.add(bits[:i] + ("0" if bits[i] == "1" else "1") + bits[i + 1 :])
        if d >= 2:
            for i in range(len(bits)):
                for j in range(i + 1, len(bits)):
                    b = list(bits)
                    b[i] = "0" if b[i] == "1" else "1"
                    b[j] = "0" if b[j] == "1" else "1"
                    out.add("".join(b))
        return sorted(out)

    cands = keyed.where(F.col("bucket").isin(flips(qbits, probe_hamming)))
    q = VEC.lit_vector(query_vec)
    scored = cands.select(key_col, F.round(VEC.cosine(F.col(vec_col), q), 4).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.asc(key_col)).limit(k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    left_key: str = "vec_id",
    right_key: str = "vec_id",
    n_planes: int = 4,
    seed: int = 42,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """For each left row, its k nearest right rows by cosine.

    exact=True does the full cross join (correctness baseline);
    exact=False blocks by LSH bucket (the at-scale path).
    Returns (left_key as qid, right_key as nid, cos, rank).
    """
    l = left.select(F.col(left_key).alias("qid"), F.col(vec_col).alias("qv"))
    r = right.select(F.col(right_key).alias("nid"), F.col(vec_col).alias("nv"))
    if exact:
        pairs = l.crossJoin(r)
    else:
        planes = _planes(n_planes, dim, seed)
        lb = l.withColumn("bucket", VEC.sign_bits(F.col("qv"), planes))
        rb = r.withColumn("bucket", VEC.sign_bits(F.col("nv"), planes))
        pairs = lb.join(rb, "bucket")
    scored = pairs.select("qid", "nid", F.round(VEC.cosine(F.col("qv"), F.col("nv")), 4).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
