"""Property test: `featurestore/incremental.py quantile_from_hist`
(the flat-coalesce first-crossing interpolation) against a pure-Python
replay over random histograms — the estimator must be exact GIVEN the
bins, monotone in prob, and inside [lo, hi]."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_LO, _HI, _NBINS = 0.0, 64.0, 8
_W = (_HI - _LO) / _NBINS

_hist = st.lists(st.integers(min_value=0, max_value=9), min_size=_NBINS, max_size=_NBINS)
_probs = st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=4
)


def _py_quantile(hist: list[int], prob: float) -> float | None:
    n = float(sum(hist))
    if n == 0:
        return None
    target = math.ceil(prob * n)
    cum = 0.0
    for i, h in enumerate(hist):
        if cum + h >= target and h > 0:
            return _LO + i * _W + (target - cum) / h * _W
        cum += h
    return None


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_hist, _probs)
def test_quantile_from_hist_matches_python_replay(spark, hist, probs):
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        quantile_from_hist,
    )

    df = spark.createDataFrame(
        [tuple(hist)], ", ".join(f"hist_{i} long" for i in range(_NBINS))
    )
    row = df.select(
        *[
            quantile_from_hist(p, _LO, _HI, _NBINS).alias(f"q{j}")
            for j, p in enumerate(probs)
        ]
    ).collect()[0]
    got = [row[f"q{j}"] for j in range(len(probs))]
    expect = [_py_quantile(hist, p) for p in probs]
    for g, e in zip(got, expect):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e, abs=1e-9)
            assert _LO <= g <= _HI
    # monotone in prob on non-empty histograms
    if sum(hist) > 0:
        pairs = sorted(zip(probs, got))
        for (p1, g1), (p2, g2) in zip(pairs, pairs[1:]):
            assert g1 <= g2 + 1e-9
