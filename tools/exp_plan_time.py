#!/usr/bin/env python
"""Split each bench query's timed cost into (a) entry construction,
(b) Catalyst analysis+optimization+physical planning, (c) execution —
guide §1 / §7.3: at sf0.1 every query is sub-second, so driver-side
planning of a large expression tree can be a material share of the
timed region. Min-of-N per phase after one warmup, same discipline as
bench.py."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = (sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "dedup_minhash_sig", "text_lm_score", "ewma_events",
    "dedup_boilerplate", "sim_topk", "sim_quantized",
    "q21_waiting_suppliers", "curate_pipeline", "contamination",
    "q5_local_supplier", "q1_pricing_summary", "resample_events",
])


def _drain(df):
    from pyspark.sql import functions as F
    row = df.agg(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row["n"]


def main():
    from duckdb_iceberg_spark import get_spark
    import __spark_entry__ as E

    spark = get_spark("exp_plan_time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    E.prepare_bucketed_fixtures(spark, SF_DIR)
    out = {}
    for name in NAMES:
        _drain(qs[name](spark, SF_DIR))  # warmup
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            # force analysis + optimization + physical planning of the
            # FULL drained query (the agg wrapper included), without
            # running it
            from pyspark.sql import functions as F
            wrapped = df.agg(
                F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
                F.count(F.lit(1)).alias("n"),
            )
            wrapped._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            wrapped.collect()
            t3 = time.perf_counter()
            rec = (round(t1 - t0, 3), round(t2 - t1, 3), round(t3 - t2, 3),
                   round(t3 - t0, 3))
            if best is None or rec[3] < best[3]:
                best = rec
        out[name] = {"construct": best[0], "plan": best[1],
                     "execute": best[2], "total": best[3]}
        print(f"# {name}: construct={best[0]} plan={best[1]} "
              f"execute={best[2]} total={best[3]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
