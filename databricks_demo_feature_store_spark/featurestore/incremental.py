"""Incremental aggregate-feature maintenance: mergeable per-key moment
state (count / exact DECIMAL sum / sum-of-squares) that folds new event
batches in WITHOUT rescanning history, plus the finalizer that turns
state into the served feature columns (mean / std / sum / count).

The reference recomputes its per-entity aggregate features from full
table scans every run (e.g. the monthly spend aggregations feeding
``fs_cus_payment_behavior``); at 100 TB a daily refresh must instead be
O(day's data): aggregate the new batch into the SAME state shape and
cell-sum it into the stored state — the classic incremental-view-
maintenance decomposition, valid because count/sum/sumsq are commutative
monoids. This module is the aggregate-feature twin of
``featurestore/training.py refresh_training_set`` (which does the same
for as-of lookup features).

Exactness contract: sums are DECIMAL(38, scale) (order-independent,
engine-independent); x² is one IEEE multiply (bit-exact everywhere)
rounded to the same DECIMAL; finalization does its divisions in double
at the very end. Merged state is therefore BIT-IDENTICAL to
single-pass state, and the driver gate proves merged-vs-full equality
rather than assuming it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def aggregate_state(
    events: DataFrame,
    keys: Sequence[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Per-key moment state of ``value_col``: ``n`` (rows with a
    non-null value), ``s`` (exact DECIMAL sum), ``s2`` (exact DECIMAL
    sum of squares). One hash aggregation with map-side combine — the
    state is ≤ one row per key however large the batch."""
    keys = list(keys)
    v = F.col(value_col)
    vdec = v.cast(f"decimal(38,{scale})")
    v2dec = (v * v).cast(f"decimal(38,{scale})")
    return events.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.coalesce(F.sum(vdec), F.lit(0).cast(f"decimal(38,{scale})")).alias("s"),
        F.coalesce(F.sum(v2dec), F.lit(0).cast(f"decimal(38,{scale})")).alias("s2"),
    )


def merge_aggregate_state(
    state_a: DataFrame, state_b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Cell-sum two moment states (union + one hash agg). Because each
    component is a commutative monoid, ``merge(state(A), state(B)) ==
    state(A ∪ B)`` bit-for-bit — the property the incremental refresh
    and any N-way tree of merges rely on."""
    keys = list(keys)
    return (
        state_a.unionByName(state_b)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("s2").alias("s2"),
        )
    )


def finalize_aggregates(
    state: DataFrame,
    keys: Sequence[str],
    prefix: str,
) -> DataFrame:
    """Serve-ready feature columns from moment state: count, exact sum,
    mean and POPULATION std (``sqrt((s2 - s²/n)/n)``, clamped at 0 for
    the 1-ulp negative a perfect-constant key can produce). Divisions
    and the square root happen once, in double, at the end — on
    identical state both engines produce identical doubles."""
    keys = list(keys)
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    var = (s2 - (s * s) / n) / n
    return state.select(
        *keys,
        F.col("n").alias(f"{prefix}_count"),
        s.alias(f"{prefix}_sum"),
        (s / n).alias(f"{prefix}_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias(f"{prefix}_std"),
    )
