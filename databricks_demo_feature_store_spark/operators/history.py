"""Table-history operators: snapshot diffing and SCD2 interval
compression.

The engine's versioned store (`sources/versioned.py`) keeps full
snapshots; these operators answer the two questions every data team asks
of snapshots — "what changed between v(N-1) and vN?" (:func:`table_diff`
— the review surface before promoting a feature-table write) and "give
me the compressed change history" (:func:`build_scd2` — monthly
snapshots collapse into validity intervals, the slowly-changing-
dimension form that makes as-of lookups and storage linear in CHANGES
instead of snapshots).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def table_diff(
    before: DataFrame,
    after: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots on a primary key: one row per key
    present in either side, with ``status ∈ {added, removed, changed,
    unchanged}``. ``compare_cols`` defaults to every shared non-key
    column; comparison is null-safe (NULL == NULL).

    One full-outer join on the key (both sides shuffle once, AQE handles
    skew); change detection is a row-local null-safe conjunction — no
    hashing step whose collisions could hide a change.
    """
    if compare_cols is None:
        shared = [c for c in before.columns if c in set(after.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    b = before.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(True).alias("__in_b"),
    )
    a = after.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(True).alias("__in_a"),
    )
    j = b.join(a, list(keys), "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__b_{c}").eqNullSafe(F.col(f"__a_{c}"))
    status = (
        F.when(F.col("__in_b").isNull(), F.lit("added"))
        .when(F.col("__in_a").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def build_scd2(
    snapshots: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Compress a snapshot series into SCD2 validity intervals: one row
    per (key, unbroken run of identical attributes) with
    ``effective_from`` (first snapshot of the run), ``effective_to``
    (first snapshot of the NEXT run, NULL for the current run) and
    ``is_current``. Attribute comparison is null-safe.

    Gaps-and-islands per key: one partitioned window (ordered by
    snapshot time) flags change points via null-safe lag comparison, a
    running sum numbers the runs, then one aggregation per (key, run)
    takes the run's first attributes and bounds; ``effective_to`` is the
    next run's start via one more lead over the aggregated (key, run)
    frame. Shuffle count is constant in the number of snapshots; state
    scales with keys × change points, never keys × snapshots.
    """
    from pyspark.sql import Window as W

    kcols = [F.col(k) for k in keys]
    base = snapshots.select(*keys, *attr_cols, F.col(ts_col).alias("__ts"))
    w = W.partitionBy(*kcols).orderBy(F.col("__ts").asc())
    changed = F.lag(F.col("__ts")).over(w).isNull()  # first snapshot
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    flagged = base.select("*", changed.cast("int").alias("__new_run"))
    # second stage: cumulative run number (window functions don't nest)
    runs = flagged.select(
        "*",
        F.sum("__new_run")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("__run"),
    )
    per_run = runs.groupBy(*keys, "__run").agg(
        F.min("__ts").alias("effective_from"),
        *[F.first(c).alias(c) for c in attr_cols],
    )
    w2 = W.partitionBy(*kcols).orderBy(F.col("effective_from").asc())
    nxt = F.lead(F.col("effective_from")).over(w2)
    return per_run.select(
        *keys,
        *attr_cols,
        "effective_from",
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )
