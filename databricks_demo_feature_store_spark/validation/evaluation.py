"""Model-evaluation statistics at corpus scale: exact ROC-AUC and
calibration (reliability) bins.

The engine ships a quality classifier (`textops/analysis.py
hashed_linear_scores`) and importance weights (DSIR) whose scores gate
what enters a training set — before trusting a threshold you measure the
scorer: AUC for ranking power, a reliability diagram for whether the
scores mean what they say. Both are EXACT and engine-reproducible.

Scale shapes:

- :func:`roc_auc` uses the rank formulation with tie handling
  (Mann–Whitney U): collapse to per-score (n_pos, n_neg) counts first
  (one hash aggregation — state is distinct scores, never rows), then
  distributed prefix sums (`attach_global_cumsum`) give each score's
  average rank without a single-partition window. All arithmetic stays
  in integers (average ranks carried as 2×rank) until one final
  division.
- :func:`calibration_bins` is one aggregation over equal-width score
  bins — scan speed, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against boolean/0-1 ``label_col``
    — one row ``(auc, n_pos, n_neg)``. Ties get the standard average
    rank (Mann–Whitney): a random scorer lands at exactly 0.5 no matter
    how coarse the scores. NULL scores/labels are dropped.

    ``AUC = (Σ_pos avg_rank − n_pos(n_pos+1)/2) / (n_pos·n_neg)`` with
    ``avg_rank`` of a tied score group = ranks_before + (group_size+1)/2.
    Doubled ranks keep every intermediate an exact integer (DECIMAL(38)
    against 100 TB row counts); both engines divide the same integers
    once at the end.
    """
    lab = F.col(label_col).cast("int")
    base = df.select(
        F.col(score_col).cast("double").alias("__s"), lab.alias("__y")
    ).where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per_score = base.groupBy("__s").agg(
        F.sum("__y").alias("__np"),
        F.sum(F.lit(1) - F.col("__y")).alias("__nn"),
    )
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_cumsum,
    )

    cum = attach_global_cumsum(
        per_score, [F.col("__s").asc()], ["__np", "__nn"]
    )
    dec = "decimal(38,0)"
    n_s = (F.col("__np") + F.col("__nn")).cast(dec)
    ranks_before = (
        (F.col("cum___np") + F.col("cum___nn")).cast(dec) - n_s
    )
    # 2 × average rank of the tied group, an exact integer
    dbl_avg_rank = F.lit(2).cast(dec) * ranks_before + n_s + F.lit(1).cast(dec)
    contrib = F.col("__np").cast(dec) * dbl_avg_rank  # 2 × Σ ranks of positives
    tot = per_score.agg(
        F.sum("__np").alias("__P"), F.sum("__nn").alias("__N")
    )
    agg = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("__P", "__N")
        .agg(F.sum(contrib).alias("__2R"))
    )
    p = F.col("__P").cast(dec)
    numer = F.col("__2R") - p * (p + F.lit(1).cast(dec))  # 2(R − P(P+1)/2)
    auc = numer.cast("double") / (
        F.lit(2.0) * F.col("__P").cast("double") * F.col("__N").cast("double")
    )
    return agg.select(
        dround(auc, round_to).alias("auc"),
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability diagram data: equal-width bins over the score range
    [0, 1] → ``(bin, n, mean_score, positive_rate)`` per non-empty bin.
    A calibrated scorer has ``mean_score ≈ positive_rate`` per bin.
    Scores outside [0, 1] clamp into the edge bins; one aggregation,
    map-side combined; sums DECIMAL-routed so the doubles are
    engine-exact.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    bin_ = F.least(
        F.lit(int(n_bins)),
        F.greatest(F.lit(1), (F.floor(s * n_bins) + 1).cast("int")),
    )
    base = df.select(s.alias("__s"), y.alias("__y"), bin_.alias("bin")).where(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    return (
        base.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(
                F.sum(F.col("__s").cast("decimal(25,10)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                round_to,
            ).alias("mean_score"),
            dround(
                F.sum("__y").cast("double") / F.count(F.lit(1)).cast("double"),
                round_to,
            ).alias("positive_rate"),
        )
    )
