"""Feature scaling: per-group z-score and min-max normalization.

Feature-store post-processing the reference leaves to consumers; here as
first-class engine operators so training pipelines can normalize features
at write time.

Determinism contract (same discipline as ``queries.py``): the mean and the
variance are computed from exact DECIMAL sums (sum, sum-of-squares), then
combined in double arithmetic with an expression shape the DuckDB oracle
mirrors token-for-token — so results are bit-identical regardless of
partitioning or engine. ``stddev_samp``-style streaming accumulation would
not be.

Design for 100 TB: one hash-partitioned window per group column set — a
single shuffle on the group keys, then pure per-row algebra. For GLOBAL
scaling don't use an empty window (single-partition funnel): aggregate to
one row and broadcast-join it back (``group_by=None`` does exactly that).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def _moment_cols(c: str) -> tuple[Column, Column, Column, Column, Column]:
    """(s1, s2, n, mn, mx) RAW aggregate expressions (decimal sums uncast —
    ``.over(w)`` must wrap the aggregate itself, so casts happen after)."""
    xd = F.col(c).cast("decimal(18,6)")
    return (
        F.sum(xd),
        F.sum(xd * xd),
        F.count(F.col(c)),
        F.min(F.col(c)),
        F.max(F.col(c)),
    )


def _scaled_exprs(
    c: str, s1: Column, s2: Column, n: Column, mn: Column, mx: Column,
    method: str, round_to: int,
) -> Column:
    x = F.col(c)
    if method == "zscore":
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - F.lit(1))
        return F.when((n > 1) & (var > 0), dround((x - mean) / F.sqrt(var), round_to))
    if method == "minmax":
        return F.when(mx > mn, dround((x - mn) / (mx - mn), round_to))
    raise ValueError(f"Unknown scaling method {method!r}; expected zscore|minmax")


def scale_features(
    df: DataFrame,
    columns: Sequence[str],
    method: str = "zscore",
    group_by: Sequence[str] | None = None,
    round_to: int = 6,
    suffix: str | None = None,
) -> DataFrame:
    """Append ``{col}_{method}`` (or ``{col}{suffix}``) scaled columns.

    * ``zscore``: (x − mean) / sample-stddev; NULL when the group has < 2
      rows or zero variance.
    * ``minmax``: (x − min) / (max − min); NULL when the group is constant.

    Grouped: one window shuffle on ``group_by``. Global: a single-row
    aggregate broadcast-joined back — never an un-partitioned window.
    """
    suffix = suffix if suffix is not None else f"_{method}"
    if group_by:
        w = Window.partitionBy(*group_by)
        out = df
        exprs = []
        for c in columns:
            rs1, rs2, rn, rmn, rmx = _moment_cols(c)
            s1 = rs1.over(w).cast("double")
            s2 = rs2.over(w).cast("double")
            n, mn, mx = rn.over(w), rmn.over(w), rmx.over(w)
            exprs.append(_scaled_exprs(c, s1, s2, n, mn, mx, method, round_to).alias(f"{c}{suffix}"))
        return out.select("*", *exprs)

    aggs = []
    for c in columns:
        s1, s2, n, mn, mx = _moment_cols(c)
        aggs += [
            s1.cast("double").alias(f"__s1_{c}"),
            s2.cast("double").alias(f"__s2_{c}"),
            n.alias(f"__n_{c}"), mn.alias(f"__mn_{c}"), mx.alias(f"__mx_{c}"),
        ]
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    exprs = [
        _scaled_exprs(
            c,
            F.col(f"__s1_{c}"), F.col(f"__s2_{c}"), F.col(f"__n_{c}"),
            F.col(f"__mn_{c}"), F.col(f"__mx_{c}"),
            method, round_to,
        ).alias(f"{c}{suffix}")
        for c in columns
    ]
    return joined.select(*[F.col(c) for c in df.columns], *exprs)
