#!/usr/bin/env python
"""Two-sided blocked knn_join A/B (r12 session 4): past the
broadcast_queries_max cap, tile the query panel (one kernel pass per
tile) instead of falling back to the pair-materializing bucket join.

Arms, both at left=16384 queries (2 tiles at the default cap 8192):
  old  — bucket-join shape (broadcast_queries_max=0): L x R / 2^planes
         candidate pair rows, each carrying BOTH 64-float vectors
         through the join and the window sort.
  new  — tiled kernel (default params): 2 mapInArrow passes over the
         right side, ~20 B/candidate leaves each kernel.

Identity is checked on a reduced right side (20k rows — the old arm
is quadratic; same code path, every bucket populated), then the timed
A/B runs on a larger right side with the noop sink (guide §1.4),
min-of-N per arm, interleaved.

Usage: python tools/exp_knn_blocked.py [emb_path] [rounds]
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
N_LEFT = 16384


def main():
    spark = get_spark("exp_knn_blocked")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(EMB)
    left = e.filter(F.col("vec_id") < N_LEFT)

    def arm(right, old):
        kw = {"broadcast_queries_max": 0} if old else {}
        return SIM.knn_join(left, right, k=5, **kw)

    # -- identity on the reduced right side --------------------------------
    r_small = e.filter((F.col("vec_id") >= N_LEFT) & (F.col("vec_id") < N_LEFT + 20_000))
    spark.sparkContext.setJobDescription("identity: new (tiled)")
    new_rows = sorted(map(tuple, arm(r_small, old=False).collect()))
    spark.sparkContext.setJobDescription("identity: old (bucket join)")
    old_rows = sorted(map(tuple, arm(r_small, old=True).collect()))
    assert new_rows == old_rows, "blocked-panel identity mismatch!"
    print(f"identity OK: {len(new_rows)} rows ({N_LEFT} queries x 20k right)")

    # -- timed A/B on the larger right side --------------------------------
    r_big = e.filter((F.col("vec_id") >= N_LEFT) & (F.col("vec_id") < N_LEFT + 50_000))
    best = {"old": 1e9, "new": 1e9}
    for r in range(ROUNDS):
        for label, old in (("old", True), ("new", False)):
            spark.sparkContext.setJobDescription(f"timed {label} round {r}")
            t0 = time.time()
            arm(r_big, old).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[label] = min(best[label], dt)
            print(f"round {r}: {label}={dt:.1f}s", flush=True)
    print(
        f"BEST old={best['old']:.1f}s new={best['new']:.1f}s "
        f"({best['old'] / best['new']:.1f}x) — {N_LEFT} queries x 50k right, planes=4"
    )


if __name__ == "__main__":
    main()
