#!/usr/bin/env python
"""Round-12 measurement probe (guide §1: measure first).

For every bench query: capture the formatted physical plan
(plans/r12/<q>_<tag>.txt), per-query min-of-N wall time with the
bench's own _drain action, and the Spark JOB COUNT per execution
(job-group bookkeeping) — at local scale the per-job scheduling floor
(~0.1-0.2 s) dominates sub-second queries, so job count is the unit
of optimization currency here.

Usage: python tools/measure_r12.py [tag] [only_csv]
Writes bench_results/r12_probe_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = [q for q in (sys.argv[2].split(",") if len(sys.argv) > 2 else []) if q]


def main() -> None:
    from duckdb_iceberg_spark import get_spark
    import __spark_entry__ as E
    from bench import BENCH_QUERIES, _drain

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("measure_r12")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    jvm = sc._jvm
    qs = E.queries()
    prep = E.prepare_bucketed_fixtures(spark, SF_DIR)
    print(f"# prep: {prep:.2f}s", file=sys.stderr)

    names = ONLY or BENCH_QUERIES
    out: dict[str, dict] = {}
    # one warmup pass over everything first (codegen/JIT)
    for name in names:
        _drain(qs[name](spark, SF_DIR))
    for name in names:
        df = qs[name](spark, SF_DIR)
        # formatted plan -> file
        try:
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover
            plan = f"explain failed: {exc}"
        with open(os.path.join(plan_dir, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(plan)
        # job count for one drained execution
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        _drain(qs[name](spark, SF_DIR))
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for jid in jobs:
            ji = tracker.getJobInfo(jid)
            if ji is not None:
                n_stages += len(ji.stageIds)
        # min-of-3 timing, bench methodology
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            nrows = _drain(qs[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        exchanges = plan.count("Exchange")
        out[name] = {
            "sec": round(best, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "rows": nrows,
            "exchanges": exchanges,
            "py_nodes": plan.count("EvalPython") + plan.count("MapInArrow")
            + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        }
        print(
            f"# {name}: {best:.3f}s jobs={len(jobs)} stages={n_stages} "
            f"exch={exchanges} rows={nrows}",
            file=sys.stderr,
        )
    total = round(sum(v["sec"] for v in out.values()), 3)
    res = {"tag": TAG, "sf_dir": SF_DIR, "total_min_sec": total, "prep_sec": round(prep, 3), "queries": out}
    dst = os.path.join(repo, "bench_results", f"r12_probe_{TAG}.json")
    with open(dst, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({"tag": TAG, "total": total}))


if __name__ == "__main__":
    main()
