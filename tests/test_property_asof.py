"""Property-based check of the direction-aware as-of join
(`operators/joins.py asof_join`) against a brute-force Python reference
on randomized spine/feature tables — hypothesis drives key overlap,
exact timestamp ties (spine == feature instant), equidistant
nearest-ties, empty histories, and tolerance cutoffs, for ALL THREE
directions in one pass."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from databricks_demo_feature_store_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)

_keys = st.integers(min_value=0, max_value=3)
_hours = st.integers(min_value=0, max_value=30)

_spine_rows = st.lists(st.tuples(_keys, _hours), min_size=1, max_size=20)
# (key, hour) unique per feature table — the operator's documented
# determinism contract — so build from a set
_feature_rows = st.sets(st.tuples(_keys, _hours), min_size=0, max_size=20)

TOL_H = 5  # tolerance used in the tolerance variant, in hours


def _brute(spine, feats, direction, tol_hours=None):
    expected = {}
    for i, (k, h) in enumerate(spine):
        back = [fh for fk, fh in feats if fk == k and fh <= h]
        fwd = [fh for fk, fh in feats if fk == k and fh >= h]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if tol_hours is not None:
            if b is not None and h - b > tol_hours:
                b = None
            if f is not None and f - h > tol_hours:
                f = None
        if direction == "backward":
            pick = b
        elif direction == "forward":
            pick = f
        else:  # nearest, exact tie -> backward
            if b is None:
                pick = f
            elif f is None:
                pick = b
            else:
                pick = b if (h - b) <= (f - h) else f
        expected[i] = pick  # matched feature hour, or None
    return expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spine=_spine_rows, feats=_feature_rows)
def test_asof_join_all_directions_match_brute_force(spark, spine, feats):
    spine_df = spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(hours=h))
            for i, (k, h) in enumerate(spine)
        ],
        "row_id int, k int, ts timestamp",
    )
    feats_df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(hours=h), float(h)) for k, h in feats],
        "k int, ft timestamp, v double",
    )
    for direction in ("backward", "forward", "nearest"):
        for tol_hours, tol_expr in ((None, None), (TOL_H, f"INTERVAL {TOL_H} HOURS")):
            out = asof_join(
                spine_df,
                feats_df,
                keys=["k"],
                spine_time="ts",
                feature_time="ft",
                direction=direction,
                tolerance_expr=tol_expr,
                matched_time_col="mft",
            )
            got = {
                r.row_id: (
                    None
                    if r.mft is None
                    else int((r.mft - BASE).total_seconds() // 3600)
                )
                for r in out.collect()
            }
            expected = _brute(spine, feats, direction, tol_hours)
            assert got == expected, (direction, tol_hours)
            # the value column rides with the matched row
            vals = {r.row_id: r.v for r in out.collect()}
            for i, pick in expected.items():
                assert vals[i] == (None if pick is None else float(pick))
