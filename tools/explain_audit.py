"""Plan audit: scans the physical plan of every registered query for
scale red flags and prints a per-query summary.

Flags:
- BatchEvalPython / PythonUDF      → row-at-a-time Python in the plan
- CartesianProduct                 → non-broadcast cross join
- count of Exchange nodes          → shuffle budget
- count of Window nodes            → window sort budget
- PushedFilters: []                → filter didn't reach the parquet scan

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from databricks_demo_feature_store_spark import get_spark

    spark = get_spark("explain-audit")
    flagged = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"ERR  {name}: {exc}")
            flagged += 1
            continue
        n_ex = plan.count("Exchange")
        n_win = len(re.findall(r"\bWindow\b", plan))
        problems = []
        if "BatchEvalPython" in plan:
            problems.append("row-at-a-time PythonUDF")
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if re.search(r"PushedFilters: \[\], .*Filter", plan, re.DOTALL) and "Scan parquet" in plan:
            # only a hint — filters on derived columns can't push down
            pass
        tag = "FLAG" if problems else "ok  "
        if problems:
            flagged += 1
        print(f"{tag} {name}: exchanges={n_ex} windows={n_win}"
              + (f"  [{'; '.join(problems)}]" if problems else ""))
    print(f"\n{flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
