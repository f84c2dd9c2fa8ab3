"""Property-based checks of the distributed global rank / prefix-sum
primitives — the round-6 scale machinery under ntile binning, exact-k
selection and KS CDFs — against brute-force Python on randomized
multisets (hypothesis drives duplicate values, skewed distributions,
tiny and partition-straddling sizes)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.functions.feature_generation import (
    attach_global_cumsum,
    attach_global_rank,
    quantile_bin,
)

_values = st.lists(
    st.integers(min_value=-20, max_value=20), min_size=1, max_size=120
)
_bins = st.integers(min_value=1, max_value=9)


def _ntile(sorted_n: int, k: int):
    q, rem = divmod(sorted_n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + (1 if b <= rem else 0)))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_values, _bins)
def test_rank_and_ntile_match_bruteforce(spark, values, k):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id int, v int")

    ranked = {
        r["id"]: (r["r"], r["t"])
        for r in attach_global_rank(
            df,
            [F.col("v").asc(), F.col("id").asc()],
            rank_col="r",
            total_col="t",
        ).collect()
    }
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    for rank0, (rid, _) in enumerate(order):
        assert ranked[rid] == (rank0 + 1, len(rows))

    bins = {
        r["id"]: r["v_qbin"]
        for r in quantile_bin(
            df, "v", k, out_col="v_qbin", tiebreak_cols=["id"]
        ).collect()
    }
    expected = _ntile(len(order), k)
    for rank0, (rid, _) in enumerate(order):
        assert bins[rid] == expected[rank0]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_values)
def test_cumsum_matches_bruteforce(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id int, v int")
    got = {
        r["id"]: r["cum_v"]
        for r in attach_global_cumsum(
            df, [F.col("id").asc()], ["v"]
        ).collect()
    }
    run = 0
    for i, v in rows:
        run += v
        assert got[i] == run
