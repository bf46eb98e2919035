#!/usr/bin/env python
"""Streaming-family bench (r11 verdict #4): time the streaming entries
beyond the sf0.1 floors and compare state-store providers.

Each entry drains a real availableNow stream (micro-batch + watermark
+ state store) to a memory sink inside the entry call, so the timed
region is the whole stream execution.

Usage:
  python tools/bench_streaming.py <sf_dir> [provider] [rounds]
    provider: hdfs (default) | rocksdb
Emits one JSON line {sf_dir, provider, queries: {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PROVIDER = sys.argv[2] if len(sys.argv) > 2 else "hdfs"
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

ENTRIES = [
    "streaming_hourly",
    "streaming_stateful",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_sessionize",
]


def main():
    from duckdb_iceberg_spark import get_spark
    import __spark_entry__ as E
    from bench import _drain

    spark = get_spark(f"bench_streaming_{PROVIDER}")
    spark.sparkContext.setLogLevel("ERROR")
    if PROVIDER == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    qs = E.queries()
    names = [n for n in ENTRIES if n in qs]
    out = {}
    for name in names:
        # warmup (codegen/JIT + file listing)
        _drain(qs[name](spark, SF_DIR))
        best = 1e9
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            n = _drain(qs[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "provider": PROVIDER, "queries": out}))


if __name__ == "__main__":
    main()
