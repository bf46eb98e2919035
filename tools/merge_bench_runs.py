#!/usr/bin/env python
"""Merge two bench JSON runs into one: per-query MIN of warm timings
(the same steady-state rule bench.py applies within a run), keeping
queries present in only one input as-is. Usage:

    python tools/merge_bench_runs.py A.json B.json > OUT.json

Metadata lists (over_budget / cold_excluded / skipped) are unioned so
a cold-excluded query stays flagged even if one run skipped it.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    q = dict(a["queries"])
    for k, v in b["queries"].items():
        q[k] = min(q[k], v) if k in q else v
    out = dict(a)
    out["queries"] = q
    out["value"] = round(sum(q.values()), 3)
    for key in ("over_budget_min_of_1", "cold_excluded_from_ratios", "skipped_no_oracle"):
        if key in a or key in b:
            out[key] = sorted(set(a.get(key, [])) | set(b.get(key, [])))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
