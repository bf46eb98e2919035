"""Edit-distance self-join via deletion neighborhoods (FastSS /
SymSpell family: Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries"). Reference parity note: the reference engine
(duckdb_iceberg) has no fuzzy-match operator — this belongs to the
training-data-pipeline surface the build brief adds on top.

Two strings within edit distance 1 share at least one member of each
other's deletion neighborhood (the string itself plus every
single-character deletion), so candidate pairs come from ONE
equi-join on the variant key — |s|+1 keys per row, O(total chars)
exploded stream, no quadratic blocking and no cross join. Candidates
are then verified with the exact levenshtein() built-in (JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col) -> "F.Column":
    """array of the string itself + every single-char deletion."""
    return F.concat(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(col.substr(F.lit(1), i - 1), col.substr(i + 1, F.length(col))),
        ),
    )


def edit_distance_pairs(
    df: DataFrame,
    col: str = "name",
    key_col: str = "id",
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a, id_b, dist) with levenshtein(a, b) <= max_dist
    and id_a < id_b. Only ``max_dist=1`` is supported — the deletion
    neighborhood of depth d grows as |s|^d, and depth 1 is the
    production sweet spot (typo detection, near-identical entity
    names); a larger radius belongs to q-gram / LSH methods.
    """
    if max_dist != 1:
        raise ValueError("edit_distance_pairs: only max_dist=1 is supported (FastSS depth 1)")
    v = df.select(
        F.col(key_col).alias("k"),
        F.col(col).alias("s"),
        F.explode(_deletion_variants(F.col(col))).alias("var"),
    ).dropDuplicates(["k", "var"])
    cand = (
        v.alias("x")
        .join(v.alias("y"), "var")
        .where(F.col("x.k") < F.col("y.k"))
        .select(
            F.col("x.k").alias("id_a"),
            F.col("y.k").alias("id_b"),
            F.col("x.s").alias("sa"),
            F.col("y.s").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.levenshtein("sa", "sb")
    return cand.select("id_a", "id_b", dist.alias("dist")).where(
        (dist >= 1) & (dist <= max_dist)
    )
