#!/usr/bin/env python
"""DuckDB-oracle twin of bench.py: times each headline query's
oracle_sql() on the same parquet dir with threads=$SPARK_GRAFT_CPUS,
same methodology (one warmup pass, two timed passes, per-query min).

Queries with no SQL oracle (approximate/streaming entries) are skipped
and listed. Prints one JSON line mirroring bench.py's shape so the two
outputs diff cleanly.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")

import duckdb

from bench import BENCH_QUERIES, SF_DIR, _selected_queries
from oracle_harness import TABLES


def main() -> None:
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    # bound the engine so list-heavy queries (minhash sigs at sf100)
    # spill instead of racing fetchall() for the whole host's RAM —
    # the OOM killer took the 2nd sf100 oracle run at 130 GB RSS
    con.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '48GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    # BENCH_ORACLE_PREPPED=1: point each view at the engine's prepared
    # physical layout (the split/bucketed multi-file rewrites under
    # /tmp/spark_graft_bucketed) instead of the raw single-file parquet
    # — the fairness A/B quantifying how much of the headline ratio is
    # storage layout vs engine. Matches layouts by the same
    # (basename, source-mtime) stamp prepare_bucketed_fixtures writes.
    prepped = bool(os.environ.get("BENCH_ORACLE_PREPPED"))
    layout_base = os.path.join(tempfile.gettempdir(), "spark_graft_bucketed")
    sfx = re.sub(r"[^0-9a-zA-Z]+", "_", os.path.basename(os.path.abspath(SF_DIR).rstrip("/")))
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        src = f"read_parquet('{p}')"
        if prepped:
            stamp = int(os.path.getmtime(p))
            pat = re.compile(rf"^{re.escape(sfx)}_{re.escape(t)}_{stamp}_(b|s)\d+v\d+$")
            cands = sorted(d for d in os.listdir(layout_base) if pat.match(d)) if os.path.isdir(layout_base) else []
            if cands:
                loc = os.path.join(layout_base, cands[-1])
                if os.path.exists(os.path.join(loc, "_SUCCESS")):
                    src = f"read_parquet('{loc}/*.parquet')"
                    print(f"# {t}: prepped layout {cands[-1]}", file=sys.stderr)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    # BENCH_ORACLE_SKIP: comma-separated names to leave out of this run
    # (e.g. re-timing the suite without repaying text_repetition's
    # ~20-min cold pass; merge per-query mins across runs afterwards).
    skip = {s for s in os.environ.get("BENCH_ORACLE_SKIP", "").split(",") if s}
    names = [q for q in _selected_queries() if q in oracles and q not in skip]
    skipped = [q for q in _selected_queries() if q not in oracles]
    timings: dict[str, float] = {}
    # Per-query budget (seconds): a query whose WARMUP already blows
    # the budget runs ONE more (warm) pass and records that, instead
    # of two more — at sf>=10 DuckDB's text_repetition regex plan runs
    # ~30 min/pass and three warm passes would dominate the wall clock.
    # The recorded number is always WARM (never the cold warmup time,
    # which would inflate the oracle baseline on exactly the slowest
    # queries and bias engine-vs-oracle ratios in the engine's favor).
    budget = float(os.environ.get("BENCH_ORACLE_BUDGET_S", "120"))
    over_budget: list[str] = []
    cold_excluded: list[str] = []
    for name in names:  # warmup (buffer cache + plan cache)
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        warm0 = time.perf_counter() - t0
        if warm0 > budget * 4:
            # pathological (e.g. text_repetition's regex plan, ~30
            # min/pass at sf10): record the COLD time but flag it so
            # comparisons exclude it from speedup ratios entirely —
            # never present a cold number as a warm one.
            timings[name] = round(warm0, 3)
            cold_excluded.append(name)
            print(
                f"# {name}: {timings[name]}s (COLD min-of-1 — excluded from ratios)",
                file=sys.stderr,
            )
        elif warm0 > budget:
            over_budget.append(name)
            t1 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            timings[name] = round(time.perf_counter() - t1, 3)
            print(
                f"# {name}: {timings[name]}s (warmup > budget; warm min-of-1)",
                file=sys.stderr,
            )
    for _pass in range(2):
        for name in names:
            if name in over_budget or name in cold_excluded:
                continue
            t0 = time.perf_counter()
            rows = con.execute(oracles[name]).fetchall()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            if _pass == 1:
                print(f"# {name}: {timings[name]}s ({len(rows)} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "oracle_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "skipped_no_oracle": skipped,
                "over_budget_min_of_1": over_budget,
                "cold_excluded_from_ratios": cold_excluded,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
