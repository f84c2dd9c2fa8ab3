"""Plan audit: scans the physical plan of every registered query for
scale red flags and prints a per-query summary.

Flags (any → FLAG, non-zero exit of the count):
- BatchEvalPython / PythonUDF       → row-at-a-time Python in the plan
- CartesianProduct                  → non-broadcast cross join
- single-partition Window           → an UNPARTITIONED Window whose input
  is not an aggregate: Spark moves every row to one task ("No Partition
  Defined for Window operation"), the shape that dies at 100×. Windows
  over aggregated inputs (1-row / per-group frames) are exempt — that is
  the documented tiny-frame pattern (cumulative offsets over partition
  counts, etc.).
- exchange budget exceeded          → more Exchange nodes than the
  per-query budget documented in SCALING.md ("## Exchange budgets"
  table). Queries without a documented budget get DEFAULT_BUDGET.

Also printed per query: exchange count vs budget, window count.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

DEFAULT_BUDGET = 8
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Nodes an unpartitioned Window may sit above without materializing the
# whole input on one task being a *scale* problem only if the chain ends
# in an Aggregate (bounded output) or a LocalRelation / OneRowRelation.
_BENIGN_CHAIN = (
    "Project",
    "Filter",
    "Sort",
    "RepartitionByExpression",
    "Repartition",
    "Coalesce",
    "SubqueryAlias",
    "Deduplicate",
)
_BOUNDED_LEAVES = (
    "Aggregate",
    "LocalRelation",
    "OneRowRelation",
    "GlobalLimit",
    # run_available_now sinks: every memory-sink view in this engine
    # holds a REPLAYED STREAMING AGGREGATE (windowed, watermark-bounded
    # state — one row per window/key), so a window over it is the
    # tiny-frame pattern, not a raw-data sort
    "MemoryPlan MemorySink",
)


def _depth(line: str) -> int:
    m = re.match(r"^[\s:+|-]*", line)
    return m.end()


def _children(lines: list[str], i: int) -> list[int]:
    """Indices of node i's immediate children in the plan-text tree
    (first deeper indentation level below i, until depth returns)."""
    d = _depth(lines[i])
    out: list[int] = []
    cd = None
    for j in range(i + 1, len(lines)):
        nd = _depth(lines[j])
        if nd <= d:
            break
        if cd is None:
            cd = nd
        if nd == cd:
            out.append(j)
    return out


def _subtree_bounded(lines: list[str], i: int) -> bool:
    """True when the subtree rooted at line i produces an
    aggregate-bounded frame: a bounded leaf, or benign nodes /
    Windows / Joins ALL of whose inputs are themselves bounded (a
    broadcast of a 1-row aggregate into an aggregated frame stays
    tiny — the stats-attach pattern; any scan/generate below makes it
    raw)."""
    node = lines[i][_depth(lines[i]):]
    if any(node.startswith(b) for b in _BOUNDED_LEAVES):
        return True
    m = re.match(r"[A-Za-z]+", node)
    name = m.group(0) if m else ""
    if name in _BENIGN_CHAIN or name in ("Window", "Join"):
        kids = _children(lines, i)
        return bool(kids) and all(_subtree_bounded(lines, k) for k in kids)
    return False


def unpartitioned_windows_over_raw(optimized_plan: str) -> list[str]:
    """Return the offending Window lines: unpartitioned (no partition
    spec group in the node text) AND the input subtree never resolves
    to aggregate-bounded frames (recursive — a join of bounded inputs
    is bounded)."""
    lines = optimized_plan.splitlines()
    offenders = []
    for i, line in enumerate(lines):
        node = line[_depth(line):]
        if not node.startswith("Window ["):
            continue
        # groups: [funcs], [partitionSpec], [orderSpec]. Unpartitioned
        # windows print two groups where the SECOND is an order spec
        # (contains ASC/DESC); partition-only windows also print two
        # groups but the second is a bare column list — partitioned,
        # fine.
        groups = node.count("], [")
        if groups >= 2:
            continue
        if groups == 1:
            tail = node.rsplit("], [", 1)[1]
            if " ASC" not in tail and " DESC" not in tail:
                continue  # [funcs], [partitionSpec] — partitioned
        kids = _children(lines, i)
        bounded = bool(kids) and all(_subtree_bounded(lines, k) for k in kids)
        if not bounded:
            offenders.append(node[:100])
    return offenders


# Queries whose defining predicates are plain column comparisons and MUST
# therefore reach the parquet reader as PushedFilters — the "filters push
# to the scan" claim, ratcheted mechanically. A refactor that hides a
# predicate behind a cast/UDF (breaking row-group pruning at scale) flags
# here even though values stay correct. q18 is absent by design: its only
# filter is post-aggregation (HAVING), nothing is scan-pushable.
PUSHDOWN_EXPECTED = {
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q03_unshipped_revenue",
    "q04_priority_returns",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_revenue",
    "q11_important_value",
    "q12_priority_lines",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q21_sole_return_suppliers",
    "q22_dormant_customers",
}


def has_nonempty_pushed_filters(executed_plan: str) -> bool:
    """True when at least one scan in the plan carries a non-empty
    PushedFilters list."""
    return bool(re.search(r"PushedFilters: \[[^\]]", executed_plan))


def load_budgets() -> dict[str, int]:
    """Parse the '## Exchange budgets' table in SCALING.md:
    rows '| q_name | N |'."""
    path = os.path.join(_REPO, "SCALING.md")
    budgets: dict[str, int] = {}
    try:
        text = open(path).read()
    except OSError:
        return budgets
    m = re.search(r"^## Exchange budgets.*?(?=^## |\Z)", text, re.M | re.S)
    if not m:
        return budgets
    for q, n in re.findall(r"^\|\s*(q\w+)\s*\|\s*(\d+)\s*\|", m.group(0), re.M):
        budgets[q] = int(n)
    return budgets


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    # Audit the SCALE-INVARIANT plan: the small-file scan fan-out
    # (queries.load/_parallelize_scan) inserts one RoundRobinPartitioning
    # exchange per scan at any sf where a local single-file table exceeds
    # 256 KB, and is by construction absent at real scale (splits ≥
    # cores). Counting it would make the exchange-budget ratchet depend
    # on the sf_dir the audit happens to run at (sf0.01 showed 78+
    # spurious budget flags before this switch existed).
    os.environ["SPARK_GRAFT_NO_SCAN_FANOUT"] = "1"

    sys.path.insert(0, _REPO)
    import __spark_entry__ as entry_mod
    from databricks_demo_feature_store_spark import get_spark

    budgets = load_budgets()
    spark = get_spark("explain-audit")
    # AQE defers the exchange-reuse rule to runtime, so an un-executed
    # adaptive plan re-prints shared subtrees once per consumer and the
    # static count overstates real shuffles. Non-adaptive planning
    # applies ReuseExchange at plan time — the audit counts what would
    # actually run.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # FileScan metadata (incl. PushedFilters) is truncated to 100 chars by
    # default — widen it so the pushdown check reads the real filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    flagged = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            logical = qe.optimizedPlan().toString()
        except Exception as exc:
            print(f"ERR  {name}: {exc}")
            flagged += 1
            continue
        # AQE prints the current plan AND an "== Initial Plan ==" copy —
        # count only the live section, and only SHUFFLE exchanges
        # (BroadcastExchange is the cheap path we WANT; ReusedExchange is
        # free).
        live = plan.split("== Initial Plan ==")[0]
        n_ex = sum(
            1
            for ln in live.splitlines()
            if ln[_depth(ln):].startswith("Exchange ")
        )
        n_win = len(re.findall(r"\bWindow\b", live))
        budget = budgets.get(name, DEFAULT_BUDGET)
        problems = []
        if "BatchEvalPython" in plan:
            problems.append("row-at-a-time PythonUDF")
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        for w in unpartitioned_windows_over_raw(logical):
            problems.append(f"single-partition Window over raw input: {w}")
        if name in PUSHDOWN_EXPECTED and not has_nonempty_pushed_filters(live):
            problems.append("no PushedFilters reached any scan")
        if n_ex > budget:
            problems.append(f"exchange budget exceeded: {n_ex} > {budget}")
        tag = "FLAG" if problems else "ok  "
        if problems:
            flagged += 1
        print(f"{tag} {name}: exchanges={n_ex}/{budget} windows={n_win}"
              + (f"  [{'; '.join(problems)}]" if problems else ""))
    print(f"\n{flagged} flagged")
    return min(flagged, 255)


if __name__ == "__main__":
    raise SystemExit(main())
