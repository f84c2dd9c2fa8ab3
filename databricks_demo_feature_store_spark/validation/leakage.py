"""Point-in-time leakage audit for assembled training sets.

The reference's whole feature-store design exists to prevent one bug:
a training row seeing feature values computed AFTER its label time
(`fs_training_set` / point-in-time lookups in the reference notebooks;
our twin is `operators/joins.py point_in_time_join`). This module is
the independent VERIFIER for that property — run it over any assembled
training frame that carries the feature-asof timestamps, and it reports,
per feature source, how many rows peeked into the future.

Scale shape: one ``stack`` unpivot of the timestamp columns (column
count × rows, no shuffle), then ONE hash aggregation keyed by feature
name — map-side combined, state = #feature sources. All arithmetic is
on integer epoch seconds; the share is one exact integer division.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def pit_leakage_audit(
    df: DataFrame,
    label_ts_col: str,
    feature_ts_cols: Sequence[str],
    embargo_seconds: int = 0,
    round_to: int = 6,
) -> DataFrame:
    """Audit a training frame for point-in-time violations: one row per
    feature-timestamp column, ``(feature, n_rows, n_null_ts,
    n_violations, max_lookahead_sec, violation_share)``.

    A row VIOLATES when its feature-asof timestamp is strictly newer
    than ``label_ts − embargo_seconds`` — i.e. the feature was computed
    after (or inside the embargo window before) the moment the label
    became known. ``embargo_seconds > 0`` enforces the stricter
    production rule that features must predate the label by a safety
    margin (pipeline latency: a feature "as of" 23:59 may not land in
    the store until the next morning). NULL feature timestamps are
    counted separately (``n_null_ts``) and are NOT violations — an
    absent feature can't leak, but a high null count is its own red
    flag. ``max_lookahead_sec`` is the worst peek in seconds (NULL when
    the column is clean); ``violation_share`` divides violations by the
    NON-NULL row count.
    """
    if not feature_ts_cols:
        raise ValueError("pit_leakage_audit requires >= 1 feature ts column")
    embargo = int(embargo_seconds)
    lab = F.col("__lab")
    from databricks_demo_feature_store_spark.functions.strings import (
        sql_identifier,
        sql_string_literal,
    )

    stack_expr = "stack({n}, {args}) as (feature, __fts)".format(
        n=len(feature_ts_cols),
        args=", ".join(
            f"'{sql_string_literal(c)}', {sql_identifier(c)}"
            for c in feature_ts_cols
        ),
    )
    long = df.select(
        F.unix_timestamp(F.col(label_ts_col)).alias("__lab"),
        F.expr(stack_expr),
    ).select(
        "feature",
        lab,
        F.unix_timestamp(F.col("__fts")).alias("__ft"),
    )
    lookahead = F.col("__ft") - (lab - F.lit(embargo))
    is_violation = F.col("__ft").isNotNull() & (lookahead > 0)
    agg = long.groupBy("feature").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("__ft").isNull().cast("long")).alias("n_null_ts"),
        F.sum(is_violation.cast("long")).alias("n_violations"),
        F.max(F.when(is_violation, lookahead)).alias("max_lookahead_sec"),
    )
    nonnull = (F.col("n_rows") - F.col("n_null_ts")).cast("double")
    share = F.when(
        nonnull > 0, F.col("n_violations").cast("double") / nonnull
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(
        "feature",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null_ts").cast("long").alias("n_null_ts"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("max_lookahead_sec").cast("long").alias("max_lookahead_sec"),
        dround(share, round_to).alias("violation_share"),
    )
