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
