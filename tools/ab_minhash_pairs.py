#!/usr/bin/env python
"""A/B: old self-join minhash_lsh_pairs vs new grouped-bucket shape.

Usage: python tools/ab_minhash_pairs.py [sf_dir] [--time]
Compares full result sets (must be identical), then optionally times
both shapes interleaved (min of N) with the bench's noop-style drain.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.1"
DO_TIME = "--time" in sys.argv

from pyspark.sql import functions as F

from duckdb_iceberg_spark import get_spark
from duckdb_iceberg_spark.operators import dedup as DD
from duckdb_iceberg_spark.operators.dedup import minhash_signatures


def old_minhash_lsh_pairs(df, text_col="text", key_col="doc_id", num_perm=16,
                          bands=4, threshold=0.5, n_shingle=1, max_bucket=None):
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, key_col, num_perm, n_shingle).cache()
    band_frames = []
    for b in range(bands):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_frames.append(
            sig.select(F.col(key_col).alias("k"), F.md5(F.concat_ws("|", *cols)).alias("bkey"), F.lit(b).alias("band"))
        )
    banded = band_frames[0]
    for bf in band_frames[1:]:
        banded = banded.unionAll(bf)
    if max_bucket is not None:
        from pyspark.sql import Window
        bsz = Window.partitionBy("band", "bkey")
        banded = (
            banded.withColumn("__bsz", F.count("*").over(bsz))
            .where(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .where(F.col("x.k") < F.col("y.k"))
        .select(F.col("x.k").alias("id_a"), F.col("y.k").alias("id_b"))
        .dropDuplicates()
    )
    a = sig.select(F.col(key_col).alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_perm)])
    b = sig.select(F.col(key_col).alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_perm)])
    est = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(num_perm)) / F.lit(float(num_perm))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


def _drain(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab_minhash_pairs")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(F.col("doc_id") < 50_000)
    kw = dict(num_perm=16, bands=4, threshold=0.5, n_shingle=3, max_bucket=10_000)

    old_rows = sorted(map(tuple, old_minhash_lsh_pairs(d, **kw).collect()))
    spark.catalog.clearCache()
    new_rows = sorted(map(tuple, DD.minhash_lsh_pairs(d, **kw).collect()))
    spark.catalog.clearCache()
    assert old_rows == new_rows, (
        f"MISMATCH: old={len(old_rows)} new={len(new_rows)}; "
        f"old-new={set(old_rows) - set(new_rows)}, new-old={set(new_rows) - set(old_rows)}"
    )
    print(f"IDENTICAL: {len(new_rows)} pairs", flush=True)

    # also exercise the uncapped default path for parity
    d2 = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(F.col("doc_id") < 2_000)
    o2 = sorted(map(tuple, old_minhash_lsh_pairs(d2, num_perm=16, bands=4, threshold=0.5).collect()))
    spark.catalog.clearCache()
    n2 = sorted(map(tuple, DD.minhash_lsh_pairs(d2, num_perm=16, bands=4, threshold=0.5).collect()))
    spark.catalog.clearCache()
    assert o2 == n2, f"UNCAPPED MISMATCH: old={len(o2)} new={len(n2)}"
    print(f"IDENTICAL (uncapped unigram): {len(n2)} pairs", flush=True)

    if DO_TIME:
        # warmup both
        _drain(old_minhash_lsh_pairs(d, **kw)); spark.catalog.clearCache()
        _drain(DD.minhash_lsh_pairs(d, **kw)); spark.catalog.clearCache()
        olds, news = [], []
        for _ in range(5):
            t0 = time.time(); _drain(old_minhash_lsh_pairs(d, **kw)); olds.append(time.time() - t0)
            spark.catalog.clearCache()
            t0 = time.time(); _drain(DD.minhash_lsh_pairs(d, **kw)); news.append(time.time() - t0)
            spark.catalog.clearCache()
        print(f"old: {sorted(olds)} min={min(olds):.3f}")
        print(f"new: {sorted(news)} min={min(news):.3f}")


if __name__ == "__main__":
    main()
