"""Event-sequence analytics: ordered funnels and retention cohorts.

The product-analytics tier over an event stream — the batch twins of what
the reference's validation notebooks eyeball by hand, expressed as plain
aggregations so they run at any event volume.

Scale shape: both operators are per-user hash aggregations with map-side
partial combine (conditional MINs / month sets collapse before the
shuffle); the funnel's step chaining is sequential CONDITIONAL aggregates
over the same grouped pass — never a per-user sort or a self-join per
step — and retention is one aggregation plus an explode of each user's
bounded distinct-month array.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: per user, the first timestamp of step 1, the first
    step-2 AFTER that, the first step-3 after THAT, and so on —
    ``(user, step1_ts, …, stepN_ts, steps_completed)``; a later step is
    NULL (and uncounted) unless every earlier step happened before it.

    Each step is one conditional MIN over the SAME per-user group: step
    k's filter references step k-1's min, so Spark plans N chained
    aggregations on an already-partitioned frame — the first groupBy
    shuffles once, the rest are exchange-free (same key). No per-step
    self-joins, no event sorting.
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    cur = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    acc = cur.groupBy("user_id").agg(
        F.min(F.when(F.col("__t") == steps[0], F.col("__ts"))).alias("step1_ts")
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step{i - 1}_ts"
        nxt = (
            cur.join(acc.select("user_id", prev), on="user_id")
            .where(F.col("__t") == step)
            .where(F.col("__ts") > F.col(prev))
            .groupBy("user_id")
            .agg(F.min("__ts").alias(f"step{i}_ts"))
        )
        acc = acc.join(nxt, on="user_id", how="left")
    completed = sum(
        (F.col(f"step{i}_ts").isNotNull()).cast("int")
        for i in range(1, len(steps) + 1)
    )
    return acc.select(
        "user_id",
        *[f"step{i}_ts" for i in range(1, len(steps) + 1)],
        completed.alias("steps_completed"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "month",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their FIRST active
    period (``grain``: "month" or "week", ISO-Monday weeks); for each
    (cohort_period, period_offset) report how many cohort members were
    active that many periods later and the retained fraction — the
    standard growth-analytics triangle.

    One per-user aggregation (first period + bounded distinct-period set,
    both map-side combinable), an explode of that set (fan-out = a user's
    distinct active periods, bounded by the observation window), and one
    counting aggregation. Never a users×periods cross join.
    """
    if grain not in ("month", "week"):
        raise ValueError(f"retention_cohorts grain must be month|week, got {grain!r}")
    period = F.trunc(F.col(ts_col).cast("date"), grain)
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.min(period).alias("__cohort"),
        F.collect_set(period).alias("__periods"),
    )
    exploded = per_user.select(
        "user_id",
        F.col("__cohort").alias("cohort_period"),
        F.explode("__periods").alias("__p"),
    )
    if grain == "month":
        off = F.months_between(F.col("__p"), F.col("cohort_period")).cast("int")
    else:
        off = (F.datediff(F.col("__p"), F.col("cohort_period")) / 7).cast("int")
    offsets = exploded.select(
        "user_id", "cohort_period", off.alias("period_offset")
    )
    if max_offset is not None:
        offsets = offsets.where(F.col("period_offset") <= max_offset)
    counts = offsets.groupBy("cohort_period", "period_offset").agg(
        F.count_distinct(F.col("user_id")).alias("n_active")
    )
    sizes = counts.where(F.col("period_offset") == 0).select(
        "cohort_period", F.col("n_active").alias("__size")
    )
    return counts.join(sizes, on="cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_active",
        dround(
            F.col("n_active").cast("double") / F.col("__size").cast("double"), 6
        ).alias("retained_fraction"),
    )
