"""Strict oracle sweep WITH the physical layout overlay active.

Same gate as tools/check_entries.py (driver-style compare_query), but
runs prepare_bucketed_fixtures first so entries route through the
bucketed/spine/projection layouts — proving the bench path, not just
the raw-parquet fallback the correctness driver exercises.

Usage: python tools/check_layout_entries.py [sf_dir] [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from oracle_harness import compare_query

import __spark_entry__ as E
from duckdb_iceberg_spark import get_spark


def main():
    args = list(sys.argv[1:])
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    queries = E.queries()
    oracles = E.oracle_sql()
    names = args or sorted(queries)
    spark = get_spark("check_layout_entries")
    spark.sparkContext.setLogLevel("ERROR")
    prep = E.prepare_bucketed_fixtures(spark, sf_dir)
    print(f"# layout prep: {prep:.1f}s", flush=True)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sql = oracles.get(name)
            if sql is None:
                ok, detail = False, "NO ORACLE"
            else:
                ok, detail = compare_query(spark, sf_dir, name, queries[name], sql)
        except Exception as ex:  # noqa: BLE001
            ok, detail = False, f"EXC: {type(ex).__name__}: {ex}"
        dt = time.time() - t0
        print(
            f"{'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s) {detail if not ok else ''}".rstrip(),
            flush=True,
        )
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
