#!/usr/bin/env python
"""Canonicalized plan-identity check for construction-only rewrites.

Builds each named entry's formatted physical plan at the CURRENT code
and diffs it against the committed plans/r12/<name>_after.txt, after
canonicalizing expression ids, plan ids, lambda variable names,
overlay-location mtimes, partition counts, and statistics. A rewrite
that only changes HOW the expression tree is constructed (builder
calls -> SQL strings) must be PLAN-IDENTICAL under this canon; any
real tree change (type, literal, operator) survives canonicalization
and shows in the diff.

Usage: SPARK_GRAFT_CPUS=32 python tools/plan_canon_diff.py name [name...]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def canon(p: str) -> str:
    p = re.sub(r"#\d+L?", "#X", p)
    p = re.sub(r"plan_id=\d+", "plan_id=X", p)
    p = re.sub(r"lambda [A-Za-z_][A-Za-z0-9_]*", "lambda V", p)
    p = re.sub(r"_\d{9,}_", "_MTIME_", p)
    p = re.sub(r"partitioning\(([^,]+), \d+\)", r"partitioning(\1, N)", p)
    p = re.sub(r"Statistics\([^)]*\)", "Statistics(X)", p)
    return p


def main() -> None:
    from duckdb_iceberg_spark import get_spark
    import __spark_entry__ as E

    names = sys.argv[1:]
    spark = get_spark("plan_canon_diff")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    E.prepare_bucketed_fixtures(spark, SF_DIR)
    jvm = spark._jvm.org.apache.spark.sql.api.python
    bad = []
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        ref_path = f"plans/r12/{name}_after.txt"
        old = open(ref_path).read()
        a, b = canon(plan), canon(old)
        if a == b:
            print(f"{name}: PLAN-IDENTICAL")
        else:
            bad.append(name)
            print(f"{name}: PLAN-DIFFERS vs {ref_path}")
            import difflib

            for line in difflib.unified_diff(
                b.splitlines(), a.splitlines(), lineterm=""
            ):
                print(line)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
