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


def lit_vector(values) -> Column:
    """Literal array<double> column from a Python list."""
    return F.array(*[F.lit(float(v)) for v in values])


def sign_bits(a, hyperplanes) -> Column:
    """Random-hyperplane LSH bucket key: one sign bit per hyperplane,
    packed into a string key. ``hyperplanes`` is a list of python
    float lists (generated from a fixed seed on the driver)."""
    bits = [F.when(dot(a, lit_vector(h)) >= 0, F.lit("1")).otherwise(F.lit("0")) for h in hyperplanes]
    return F.concat(*bits)
