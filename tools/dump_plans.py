"""Dump ``explain("formatted")`` plans for registered queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each selected query (all
registered queries when none are named). The round's optimization evidence:
capture ``before`` at the start of the round and ``after`` for every query
whose plan an optimization changed, at the benchmark scale (sf0.1) so the
plans show the join strategies / exchange counts the bench actually runs.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, _REPO)
    import __spark_entry__ as entry_mod
    from databricks_demo_feature_store_spark import get_spark

    spark = get_spark("dump-plans")
    # FileScan metadata (incl. PushedFilters) truncates at 100 chars by
    # default — widen so the files show the real filter/schema lists.
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    n_err = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # keep going; record the failure
            text = f"ERROR constructing/explaining {name}: {exc}\n"
            n_err += 1
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}")
    print(f"{n_err} errors")
    return min(n_err, 255)


if __name__ == "__main__":
    raise SystemExit(main())
