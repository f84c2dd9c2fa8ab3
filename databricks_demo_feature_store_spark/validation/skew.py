"""Training/serving skew audit for feature tables.

The failure mode this catches is the other half of the PIT-leakage
story: a model is TRAINED on a feature table's full history but SERVED
from the online snapshot (the latest row per entity —
``featurestore/training.py latest_features``). When the snapshot's
feature distribution drifts away from the history the model saw, online
predictions silently degrade — the classic training/serving skew the
reference's feature-store design exists to make detectable (one storage
for both paths; cf. ``notebooks/utils.py:1778-1836`` /
``publish_table`` online sync).

Scale shape: ONE ``stack`` unpivot per side (no shuffle), per-feature
cutpoints from ONE grouped percentile aggregation over the offline side
(rows = #features, broadcast back), per-row binning as a broadcast-join
fold (neither side shuffles to bin), then one (feature, bin) count
aggregation per side and the smoothed-PSI finisher over the
broadcast-sized count frame. Cost is one scan of the history + one of
the snapshot regardless of feature count — never 2 passes per feature.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def _stack_features(df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    from databricks_demo_feature_store_spark.functions.strings import (
        sql_identifier,
        sql_string_literal,
    )

    expr = "stack({n}, {args}) as (feature, __v)".format(
        n=len(feature_cols),
        args=", ".join(
            f"'{sql_string_literal(c)}', CAST({sql_identifier(c)} AS DOUBLE)"
            for c in feature_cols
        ),
    )
    return df.select(F.expr(expr))


def serving_skew_audit(
    features: DataFrame,
    primary_keys: Sequence[str],
    timestamp_key: str,
    feature_cols: Sequence[str],
    as_of: str | None = None,
    n_bins: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Per-feature PSI of the ONLINE serving snapshot (latest row per
    entity, optionally as of a fixed timestamp) against the full OFFLINE
    training history of the same feature table. One row per feature:
    ``(feature, psi, n_categories, n_online, n_offline)``.

    Cutpoints (``n_bins`` equal-frequency, exact percentiles) are fitted
    on the OFFLINE side — the distribution the model trained on defines
    "expected", and the fitted bins stay fixed as snapshots are re-audited
    over time. NULLs form their own bin (a NULL-rate gap between history
    and snapshot is skew). Laplace smoothing matches
    :func:`databricks_demo_feature_store_spark.validation.drift.psi_drift`:
    ``p = (n + 0.5) / (tot + 0.5·K)`` with K = categories present on
    either side of THAT feature.
    """
    if not feature_cols:
        raise ValueError("serving_skew_audit requires >= 1 feature column")
    from databricks_demo_feature_store_spark.featurestore.training import (
        latest_features,
    )

    online = latest_features(features, primary_keys, timestamp_key, as_of=as_of)
    off_long = _stack_features(features, feature_cols)
    on_long = _stack_features(online, feature_cols)

    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = off_long.groupBy("feature").agg(
        F.percentile(
            F.col("__v"), F.array(*[F.lit(float(q)) for q in qs])
        ).alias("__qs")
    )

    def binned(long: DataFrame, side: str) -> DataFrame:
        b = long.join(F.broadcast(cuts), "feature")
        bin_idx = F.when(
            F.col("__v").isNotNull(),
            F.lit(1)
            + F.aggregate(
                F.col("__qs"),
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("__v") > c, 1).otherwise(0),
            ),
        )
        cat = F.coalesce(bin_idx.cast("string"), F.lit("__null__"))
        return b.groupBy("feature", cat.alias("category")).agg(
            F.count(F.lit(1)).alias("__n")
        ).select(
            "feature",
            "category",
            (F.col("__n") if side == "cur" else F.lit(0)).cast("long").alias("__n_cur"),
            (F.col("__n") if side == "ref" else F.lit(0)).cast("long").alias("__n_ref"),
        )

    j = (
        binned(on_long, "cur")
        .unionByName(binned(off_long, "ref"))
        .groupBy("feature", "category")
        .agg(F.sum("__n_cur").alias("__n_cur"), F.sum("__n_ref").alias("__n_ref"))
    )
    # per-feature totals via a PARTITIONED window over the aggregated
    # (feature × category) frame — broadcast-sized by construction
    wg = W.partitionBy("feature")
    jt = j.select(
        "feature",
        "category",
        "__n_cur",
        "__n_ref",
        F.count(F.lit(1)).over(wg).alias("__k"),
        F.sum("__n_cur").over(wg).alias("__tot_cur"),
        F.sum("__n_ref").over(wg).alias("__tot_ref"),
    )
    p_cur = (F.col("__n_cur") + F.lit(0.5)) / (
        F.col("__tot_cur") + F.lit(0.5) * F.col("__k")
    )
    p_ref = (F.col("__n_ref") + F.lit(0.5)) / (
        F.col("__tot_ref") + F.lit(0.5) * F.col("__k")
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        jt.groupBy("feature", "__k", "__tot_cur", "__tot_ref")
        .agg(F.sum(term).alias("__psi"))
        .select(
            "feature",
            dround(F.col("__psi"), round_to).alias("psi"),
            F.col("__k").cast("int").alias("n_categories"),
            F.col("__tot_cur").cast("long").alias("n_online"),
            F.col("__tot_ref").cast("long").alias("n_offline"),
        )
    )
