"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (`zip_with`/`aggregate`) —
evaluated JVM-side per row with no Python boundary, so a brute-force
cosine scan parallelizes across executors at full scan speed. All
arithmetic is double (elements cast up) so the DuckDB oracle can
reproduce values exactly with the same summation order
(generate_subscripts + SUM ... ORDER-independent: we round before
comparing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_to_query(a, query_vec) -> Column:
    """cosine(a, literal query) with the query norm folded on the
    driver — norm(lit_vector(q)) is NOT constant-folded by Catalyst,
    so the naive form re-aggregates 2*dim ops per row."""
    import math

    q = lit_vector(query_vec)
    qn = math.sqrt(sum(float(v) * float(v) for v in query_vec)) or 1e-30
    return dot(a, q) / (norm(a) * F.lit(qn))


def lit_vector(values) -> Column:
    """Literal array<double> column from a Python list."""
    return F.array(*[F.lit(float(v)) for v in values])


def cosine_pairs_fast(a, b) -> Column:
    """Vectorized Arrow twin of :func:`cosine` for two VECTOR COLUMNS
    (candidate-pair verification after LSH/IVF blocking): each batch
    is three numpy rowwise reductions instead of ~2*dim interpreted
    HOF lambda steps per pair (the same boundary sign_bits_fast
    documents — at millions of candidate pairs the interpreted fold is
    the whole verify cost). Value identity: same IEEE double dot/norm
    up to float summation REORDERING (~1e-13 relative), absorbed by
    the 4-decimal rounding every caller applies — the same tolerance
    the DuckDB oracle twins' own list_cosine_similarity order already
    exercises. NULL on either side yields NULL, matching the JVM
    shape. Falls back to :func:`cosine` when numpy is unavailable."""
    try:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
    except ImportError:
        return cosine(a, b)

    def _kernel(xa, xb):
        if len(xa) == 0:
            return pd.Series([], dtype="float64")
        isnull = (xa.isna() | xb.isna()).to_numpy()
        out = np.full(len(xa), np.nan)
        if (~isnull).any():
            x = np.stack(xa[~isnull].to_numpy()).astype(np.float64)
            y = np.stack(xb[~isnull].to_numpy()).astype(np.float64)
            dot = (x * y).sum(axis=1)
            nx = np.sqrt((x * x).sum(axis=1))
            ny = np.sqrt((y * y).sum(axis=1))
            out[~isnull] = dot / (nx * ny)
        s = pd.Series(out)
        return s.where(~pd.isna(s), None)

    return pandas_udf(_kernel, "double")(a, b)


def quantize_int8(a) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) — explicit half-up rounding so the
    DuckDB oracle reproduces every code exactly (built-in round()
    tie-breaking differs between engines).

    Returns struct(scale double, codes array<int>). 4x smaller than
    float32 on disk/wire; cosine is scale-invariant, so ranking
    against quantized vectors needs only the codes.
    """
    # The absmax aggregate must be bound ONCE per row, not inlined into
    # the per-element transform lambda (that inlining is O(dim^2) per
    # row — measured 10x on the sim_quantized bench). Spark expressions
    # have no let-binding, but aggregate()'s finish lambda receives the
    # final accumulator as a bound variable — use it as one.
    def _finish(m):
        scale = F.greatest(m / F.lit(127.0), F.lit(1e-30))
        codes = F.transform(
            a, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int")
        )
        return F.struct(scale.alias("scale"), codes.alias("codes"))

    return F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        _finish,
    )


def sign_bits(a, hyperplanes) -> Column:
    """Random-hyperplane LSH bucket key: one sign bit per hyperplane,
    packed into a string key. ``hyperplanes`` is a list of python
    float lists (generated from a fixed seed on the driver)."""
    bits = [F.when(dot(a, lit_vector(h)) >= 0, F.lit("1")).otherwise(F.lit("0")) for h in hyperplanes]
    return F.concat(*bits)


def sign_bits_fast(a, hyperplanes) -> Column:
    """Vectorized Arrow twin of :func:`sign_bits`: each batch is ONE
    numpy matmul (rows x dim @ dim x planes) instead of ``n_planes``
    interpreted HOF dot folds per row — Catalyst evaluates aggregate()
    lambdas per element (~400 ns each), which at 2M x 64-dim x 8
    planes is ~10^9 interpreted steps (measured 41-47 s vs ~3 s for
    this kernel on the sf100 embeddings; see bench_ann).

    Bit identity with sign_bits: both compute sign(dot(v, plane)) in
    IEEE double; they can differ only when float summation REORDERING
    changes the sign, i.e. |dot| within ~1e-13 of 0 — the same
    never-in-practice margin the DuckDB oracle twin (its own
    list_dot_product order) already tolerates. A NULL vector gets the
    all-'0' key, matching sign_bits' when(NULL >= 0)->otherwise('0').
    Falls back to the JVM shape when numpy/pandas are unavailable."""
    if not hyperplanes:
        # n_planes=0 (single-bucket mode): concat() of nothing — keep
        # the JVM shape, there is no kernel to vectorize
        return sign_bits(a, hyperplanes)
    try:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
    except ImportError:
        return sign_bits(a, hyperplanes)

    P = np.asarray([[float(x) for x in h] for h in hyperplanes], dtype=np.float64).T
    n = P.shape[1]
    zeros = "0" * n

    def _kernel(emb):
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        isnull = emb.isna().to_numpy()
        out = np.full(len(emb), zeros, dtype=object)
        if (~isnull).any():
            x = np.stack(emb[~isnull].to_numpy()).astype(np.float64)
            bits = np.where(x @ P >= 0, "1", "0")
            out[~isnull] = ["".join(row) for row in bits]
        return pd.Series(out)

    return pandas_udf(_kernel, "string")(a)
