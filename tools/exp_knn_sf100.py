#!/usr/bin/env python
"""sf100 knn_join A/B: bucket-join shape (r11) vs broadcast-kernel
path (r12), 512 queries x 2M vectors, identity-checked (the result is
only 512*k rows).

Usage: python tools/exp_knn_sf100.py [emb_path] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_iceberg_spark import get_spark
from duckdb_iceberg_spark.operators import similarity as SIM

EMB = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf100txt/embeddings.parquet"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    spark = get_spark("exp_knn_sf100")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(EMB)
    left = e.filter(F.col("vec_id") < 512)
    right = e.filter(F.col("vec_id") >= 512)

    def new_df():
        return SIM.knn_join(left, right, k=5)

    def old_df():
        return SIM.knn_join(left, right, k=5, broadcast_queries_max=0)

    t0 = time.time()
    new_rows = sorted(map(tuple, new_df().collect()))
    t_new_first = time.time() - t0
    t0 = time.time()
    old_rows = sorted(map(tuple, old_df().collect()))
    t_old_first = time.time() - t0
    assert new_rows == old_rows, "sf100 identity mismatch!"
    print(f"identity OK: {len(new_rows)} rows; first-run new={t_new_first:.1f}s old={t_old_first:.1f}s")

    best = {"old": 1e9, "new": 1e9}
    for r in range(ROUNDS):
        t0 = time.time(); old_df().write.format("noop").mode("overwrite").save()
        dt_o = time.time() - t0
        t0 = time.time(); new_df().write.format("noop").mode("overwrite").save()
        dt_n = time.time() - t0
        best["old"] = min(best["old"], dt_o); best["new"] = min(best["new"], dt_n)
        print(f"round {r}: old={dt_o:.1f}s new={dt_n:.1f}s")
    print(f"BEST old={best['old']:.1f}s new={best['new']:.1f}s")


if __name__ == "__main__":
    main()
