"""Property-based check of the single-pass funnel fold against a
brute-force sequential scan — hypothesis drives repeated step types,
same-timestamp events, missing steps, out-of-order arrivals and
multi-user interleaving (the conditions under which the old per-step
join form and the fold could disagree)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from databricks_demo_feature_store_spark.operators.events import funnel_steps

BASE = dt.datetime(2024, 1, 1)
STEPS = ["view", "click", "purchase"]
TYPES = STEPS + ["noise"]

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user
        st.integers(min_value=0, max_value=12),       # hour
        st.integers(min_value=0, max_value=len(TYPES) - 1),  # type idx
    ),
    min_size=1,
    max_size=30,
)


def _brute(events):
    """Sequential semantics: step 1 = first 'view'; step k = first
    step-k event STRICTLY after step k-1's time."""
    out = {}
    for user in {u for u, _, _ in events}:
        evs = sorted(
            [(h, TYPES[t], i) for i, (u, h, t) in enumerate(events) if u == user]
        )
        times = [None] * len(STEPS)
        for h, typ, _ in evs:
            for k, s in enumerate(STEPS):
                if (
                    times[k] is None
                    and typ == s
                    and (k == 0 or (times[k - 1] is not None and h > times[k - 1]))
                ):
                    times[k] = h
                    break  # one event advances at most one slot
        out[user] = tuple(times)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_events)
def test_funnel_fold_matches_sequential_bruteforce(spark, events):
    rows = [
        (i, BASE + dt.timedelta(hours=h), u, TYPES[t])
        for i, (u, h, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["user_id"]: tuple(
            None if r[f"step{k}_ts"] is None
            else int((r[f"step{k}_ts"] - BASE).total_seconds() // 3600)
            for k in (1, 2, 3)
        )
        for r in funnel_steps(df, STEPS).collect()
    }
    want = _brute(events)
    assert got == want
    # steps_completed consistency
    for r in funnel_steps(df, STEPS).collect():
        n = sum(r[f"step{k}_ts"] is not None for k in (1, 2, 3))
        assert r["steps_completed"] == n


def test_event_paths_overlap_and_determinism(spark):
    """Overlapping windows all count (5 events -> 3 trigrams), per-user
    isolation holds, tie order is deterministic, depth guard raises."""
    import datetime as dt

    import pytest

    from databricks_demo_feature_store_spark.operators.events import event_paths

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, minutes, typ):
        return (eid, user, t0 + dt.timedelta(minutes=minutes), typ)

    events = spark.createDataFrame(
        [
            ev(1, 1, 0, "a"), ev(2, 1, 1, "b"), ev(3, 1, 2, "a"),
            ev(4, 1, 3, "b"), ev(5, 1, 4, "a"),
            ev(6, 2, 0, "a"), ev(7, 2, 1, "b"), ev(8, 2, 2, "a"),
            ev(9, 3, 0, "x"), ev(10, 3, 1, "y"),  # too short: no trigram
        ],
        "event_id int, user_id int, ts timestamp, event_type string",
    )
    out = event_paths(events, depth=3, k=10).collect()
    got = {r.path: (r.n_paths, r.n_users) for r in out}
    assert got == {"a>b>a": (3, 2), "b>a>b": (1, 1)}
    # deterministic order: count desc then path asc
    assert [r.path for r in out] == ["a>b>a", "b>a>b"]

    with pytest.raises(ValueError, match="depth"):
        event_paths(events, depth=1)


def test_event_paths_null_types_break_windows(spark):
    """A NULL event type invalidates every window containing it instead
    of concat_ws silently skipping it (ADVICE r10: 'a>c' from a 3-step
    window was conflated with genuine 2-step paths)."""
    import datetime as dt

    from databricks_demo_feature_store_spark.operators.events import event_paths

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            (1, 1, t0 + dt.timedelta(minutes=0), "a"),
            (2, 1, t0 + dt.timedelta(minutes=1), None),
            (3, 1, t0 + dt.timedelta(minutes=2), "c"),
            (4, 1, t0 + dt.timedelta(minutes=3), "d"),
            (5, 2, t0 + dt.timedelta(minutes=0), "a"),
            (6, 2, t0 + dt.timedelta(minutes=1), "c"),
        ],
        "event_id int, user_id int, ts timestamp, event_type string",
    )
    # depth=3: user 1's only NULL-free window is c>d... too short; none.
    assert event_paths(events, depth=3, k=10).count() == 0
    # depth=2: the NULL breaks a>? and ?>c; c>d and user 2's a>c survive
    got = {r.path: r.n_paths for r in event_paths(events, depth=2, k=10).collect()}
    assert got == {"c>d": 1, "a>c": 1}


def test_path_conversion_outcomes_hand_checked(spark):
    """Conversion = the event immediately AFTER the path window equals
    the target; end-of-stream and non-target outcomes are abandonment;
    NULL mid-path steps invalidate the window but a NULL outcome is a
    real abandonment."""
    import datetime as dt

    import pytest

    from databricks_demo_feature_store_spark.operators.events import path_conversion

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, minutes, typ):
        return (eid, user, t0 + dt.timedelta(minutes=minutes), typ)

    events = spark.createDataFrame(
        [
            # user 1: a>b → buy (converted), b>buy → end (abandoned)
            ev(1, 1, 0, "a"), ev(2, 1, 1, "b"), ev(3, 1, 2, "buy"),
            # user 2: a>b → c (abandoned), b>c → end (abandoned)
            ev(4, 2, 0, "a"), ev(5, 2, 1, "b"), ev(6, 2, 2, "c"),
            # user 3: a>NULL invalid, NULL>b invalid, b's window too short
            ev(7, 3, 0, "a"), ev(8, 3, 1, None), ev(9, 3, 2, "b"),
        ],
        "event_id int, user_id int, ts timestamp, event_type string",
    )
    out = path_conversion(events, target="buy", depth=2, k=10)
    got = {r.path: (r.n_paths, r.n_converted, r.conversion_rate) for r in out.collect()}
    assert got == {
        "a>b": (2, 1, 0.5),
        "b>buy": (1, 0, 0.0),
        "b>c": (1, 0, 0.0),
    }
    # order: n_paths desc then path asc
    assert [r.path for r in out.collect()] == ["a>b", "b>buy", "b>c"]
    with pytest.raises(ValueError, match="depth"):
        path_conversion(events, target="buy", depth=0)
