#!/usr/bin/env python
"""Entry-level interleaved A/B for dedup_minhash_sig: arrow_partial
min aggregation ON (new default) vs OFF (r11 shape), bench methodology
(_drain, min-of-N), on the exact path the bench runs (layout overlay).

Usage: python tools/exp_minhash_entry_ab.py <sf_dir> [rounds]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    from duckdb_iceberg_spark import get_spark
    from duckdb_iceberg_spark.operators import dedup as DD
    import __spark_entry__ as E
    from bench import _drain

    spark = get_spark("exp_minhash_entry_ab")
    spark.sparkContext.setLogLevel("ERROR")
    prep = E.prepare_bucketed_fixtures(spark, SF_DIR)
    print(f"# prep {prep:.1f}s", file=sys.stderr)
    entry = E.queries()["dedup_minhash_sig"]

    orig = DD.minhash_signatures

    @functools.wraps(orig)
    def forced_off(*a, **k):
        k["arrow_partial"] = False
        return orig(*a, **k)

    def run(tag):
        t0 = time.perf_counter()
        n = _drain(entry(spark, SF_DIR))
        return time.perf_counter() - t0, n

    # identity first
    new_rows = sorted(map(tuple, entry(spark, SF_DIR).collect()))
    DD.minhash_signatures = forced_off
    old_rows = sorted(map(tuple, entry(spark, SF_DIR).collect()))
    DD.minhash_signatures = orig
    assert new_rows == old_rows, "arrow_partial changed entry results!"
    print(f"# identity ok: {len(new_rows)} rows", file=sys.stderr)

    best = {"old": 1e9, "new": 1e9}
    # warmup both
    run("new")
    DD.minhash_signatures = forced_off
    run("old")
    DD.minhash_signatures = orig
    for r in range(ROUNDS):
        DD.minhash_signatures = forced_off
        dt, n = run("old")
        best["old"] = min(best["old"], dt)
        DD.minhash_signatures = orig
        dt2, _ = run("new")
        best["new"] = min(best["new"], dt2)
        print(f"round {r}: old={dt:.3f} new={dt2:.3f} ({n} rows)")
    print(f"BEST old={best['old']:.3f} new={best['new']:.3f}")


if __name__ == "__main__":
    main()
