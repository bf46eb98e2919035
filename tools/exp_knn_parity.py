#!/usr/bin/env python
"""Parity check: knn_join broadcast-kernel path vs the bucket-join
shape (broadcast_queries_max=0), LSH and exact modes, on real fixture
embeddings plus synthetic NULL-vector rows on both sides.

Usage: python tools/exp_knn_parity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_iceberg_spark import get_spark
from duckdb_iceberg_spark.operators import similarity as SIM

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def rows(df):
    return sorted(map(tuple, df.collect()))


def main():
    spark = get_spark("exp_knn_parity")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    left = e.filter(F.col("vec_id") < 20)
    right = e.filter(F.col("vec_id") >= 20)

    for exact in (False, True):
        new = rows(SIM.knn_join(left, right, k=5, exact=exact))
        old = rows(SIM.knn_join(left, right, k=5, exact=exact, broadcast_queries_max=0))
        assert new == old, f"mismatch exact={exact}: {len(new)} vs {len(old)} rows"
        print(f"exact={exact}: {len(new)} rows identical")

    # NULL vectors on both sides + a zero vector (NaN cosine -> NULL)
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    dim = 8
    import random

    random.seed(7)
    mk = lambda: [random.uniform(-1, 1) for _ in range(dim)]  # noqa: E731
    lrows = [(0, mk()), (1, None), (2, mk()), (3, [0.0] * dim)]
    rrows = [(10 + i, mk()) for i in range(40)] + [(99, None), (98, [0.0] * dim)]
    L = spark.createDataFrame(lrows, schema)
    R = spark.createDataFrame(rrows, schema)
    for exact in (False, True):
        new = rows(SIM.knn_join(L, R, k=3, exact=exact))
        old = rows(SIM.knn_join(L, R, k=3, exact=exact, broadcast_queries_max=0))
        assert new == old, f"NULL-case mismatch exact={exact}:\nnew={new}\nold={old}"
        print(f"null-case exact={exact}: {len(new)} rows identical")
    print("PARITY OK")


if __name__ == "__main__":
    main()
