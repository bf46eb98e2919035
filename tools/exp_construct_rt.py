#!/usr/bin/env python
"""Per-entry CONSTRUCTION cost probe: py4j round trips + wall time for
building each bench query's DataFrame (the part of bench.py's timed
region that is pure driver-side plan assembly, before any Spark job).

Round-trip counts are deterministic — the noise-free before/after
metric for construction optimizations; wall time is the same thing in
seconds (~0.14 ms/trip on this host's loopback).

Usage: python tools/exp_construct_rt.py [names_csv]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import py4j.clientserver as cs

    from duckdb_iceberg_spark import get_spark
    import __spark_entry__ as E
    from bench import BENCH_QUERIES, PROBE_QUERIES

    names = (
        sys.argv[1].split(",") if len(sys.argv) > 1
        else BENCH_QUERIES + PROBE_QUERIES
    )
    spark = get_spark("exp_construct_rt")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    E.prepare_bucketed_fixtures(spark, SF_DIR)

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counted
    out = {}
    for name in names:
        qs[name](spark, SF_DIR)  # warmup (first-call imports, caches)
        best_t, best_rt = None, None
        for _ in range(5):
            counter["n"] = 0
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR)
            dt = time.perf_counter() - t0
            rt = counter["n"]
            if best_t is None or dt < best_t:
                best_t = dt
            if best_rt is None or rt < best_rt:
                best_rt = rt
        out[name] = {"construct_sec": round(best_t, 4), "roundtrips": best_rt}
        print(f"# {name}: rt={best_rt} t={best_t:.3f}s", file=sys.stderr)
    cs.ClientServerConnection.send_command = orig
    tot_rt = sum(v["roundtrips"] for v in out.values())
    tot_t = round(sum(v["construct_sec"] for v in out.values()), 3)
    print(f"# TOTAL rt={tot_rt} t={tot_t}s", file=sys.stderr)
    print(json.dumps({"queries": out, "total_roundtrips": tot_rt,
                      "total_construct_sec": tot_t}))


if __name__ == "__main__":
    main()
