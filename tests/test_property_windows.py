"""Property-based checks of the anchor-carry window-aggregate family
(`operators/windows.py trailing_window_features /
trailing_multi_window_features / label_window_features`) against
brute-force Python references — hypothesis drives boundary collisions
(events exactly at anchors), duplicate spine instants, empty windows,
multi-window consistency, and the CDC fold (`operators/cdc.py
apply_changes`) against a dict replay."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

BASE = dt.datetime(2024, 1, 1)

_keys = st.integers(min_value=0, max_value=3)
_hours = st.integers(min_value=0, max_value=60)
_vals = st.integers(min_value=-50, max_value=50)

_spine_rows = st.lists(st.tuples(_keys, _hours), min_size=1, max_size=15)
_event_rows = st.lists(st.tuples(_keys, _hours, _vals), min_size=0, max_size=25)

W1, W2 = 8, 24  # trailing window widths (hours); label horizon reuses W1


def _trailing_ref(spine, events, w):
    out = []
    for k, h in spine:
        in_w = [v for ek, eh, v in events if ek == k and h - w <= eh < h]
        out.append((float(sum(in_w)), len(in_w)))
    return out


def _label_ref(spine, events, horizon):
    out = []
    for k, h in spine:
        in_w = [v for ek, eh, v in events if ek == k and h < eh <= h + horizon]
        out.append((float(sum(in_w)), len(in_w)))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spine=_spine_rows, events=_event_rows)
def test_window_family_matches_brute_force(spark, spine, events):
    from databricks_demo_feature_store_spark.operators.windows import (
        label_window_features,
        trailing_multi_window_features,
        trailing_window_features,
    )

    spine_df = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(hours=h)) for i, (k, h) in enumerate(spine)],
        "row_id int, k int, ts timestamp",
    )
    events_df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(hours=h), float(v)) for k, h, v in events],
        "k int, et timestamp, v double",
    )

    trail = trailing_window_features(
        spine_df, events_df, keys=["k"], spine_time="ts", event_time="et",
        window_expr=f"INTERVAL {W1} HOURS",
        sum_cols=[("s", "v")], count_col="n",
    )
    got = {r.row_id: (r.s, r.n) for r in trail.collect()}
    ref = _trailing_ref(spine, events, W1)
    assert got == {i: ref[i] for i in range(len(spine))}

    multi = trailing_multi_window_features(
        spine_df, events_df, keys=["k"], spine_time="ts", event_time="et",
        windows=[("w1", f"INTERVAL {W1} HOURS"), ("w2", f"INTERVAL {W2} HOURS")],
        sum_cols=[("s", "v")], count_col="n",
    )
    got1 = {r.row_id: (r.s_w1, r.n_w1) for r in multi.collect()}
    got2 = {r.row_id: (r.s_w2, r.n_w2) for r in multi.collect()}
    ref2 = _trailing_ref(spine, events, W2)
    assert got1 == {i: ref[i] for i in range(len(spine))}
    assert got2 == {i: ref2[i] for i in range(len(spine))}

    lab = label_window_features(
        spine_df, events_df, keys=["k"], spine_time="ts", event_time="et",
        horizon_expr=f"INTERVAL {W1} HOURS",
        sum_cols=[("s", "v")], count_col="n",
    )
    gotl = {r.row_id: (r.s, r.n) for r in lab.collect()}
    refl = _label_ref(spine, events, W1)
    assert gotl == {i: refl[i] for i in range(len(spine))}


_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.booleans(),                           # is delete
        st.integers(min_value=-40, max_value=40),  # payload value
    ),
    min_size=0,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(changes=_changes)
def test_apply_changes_matches_dict_replay(spark, changes):
    from databricks_demo_feature_store_spark.operators.cdc import apply_changes

    snap_rows = [(k, float(k * 10)) for k in range(3)]  # keys 0,1,2 exist
    snapshot = spark.createDataFrame(snap_rows, "k int, val double")
    # unique sequences: the list index IS the sequence (arrival order)
    change_rows = [
        (k, i, "D" if is_del else "U", None if is_del else float(v))
        for i, (k, is_del, v) in enumerate(changes)
    ]
    changes_df = spark.createDataFrame(
        change_rows, "k int, seq int, op string, val double"
    )

    state = dict(snap_rows)
    final: dict[int, tuple] = {}
    for k, is_del, v in changes:
        final[k] = ("D", None) if is_del else ("U", float(v))
    for k, (op, v) in final.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v

    out = apply_changes(snapshot, changes_df, keys=["k"], sequence_col="seq")
    got = {r.k: r.val for r in out.collect()}
    assert got == state
