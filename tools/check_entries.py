"""Strict driver-style sweep over __spark_entry__ entries.

Usage: python tools/check_entries.py [sf_dir] [name ...]
Defaults to /root/testdata/sf0.001 and ALL entries. Mirrors the
driver's t2 gate via tests/oracle_harness.compare_query (strict canon,
no rows-only escape hatch — a missing oracle is a FAIL here).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from oracle_harness import compare_query

import __spark_entry__ as E
from duckdb_iceberg_spark import get_spark


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    queries = E.queries()
    oracles = E.oracle_sql()
    names = args or sorted(queries)
    spark = get_spark("check_entries")
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
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s) {detail if not ok else ''}".rstrip(), flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
