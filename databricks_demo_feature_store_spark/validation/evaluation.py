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

from pyspark.sql import DataFrame, functions as F

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


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact precision–recall curve: one row per DISTINCT score
    (descending-threshold order), ``(threshold, n_at, tp, fp, precision,
    recall)`` where tp/fp are cumulative counts at ``score >=
    threshold``. Collapses to per-score counts first (state = distinct
    scores, never rows), then distributed prefix sums in descending
    score order (`attach_global_cumsum` — no single-partition window).
    Every emitted number is one division of exact integers, so both
    engines reproduce it bit-for-bit. NULL scores/labels are dropped.
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
        per_score, [F.col("__s").desc()], ["__np", "__nn"]
    )
    tp, fp = F.col("cum___np"), F.col("cum___nn")
    # total positives via a broadcast 1-row aggregate (not an
    # unpartitioned window over the data)
    tot = per_score.agg(F.sum("__np").alias("__P"))
    out = cum.crossJoin(F.broadcast(tot))
    precision = tp.cast("double") / (tp + fp).cast("double")
    recall = F.when(
        F.col("__P") > 0, tp.cast("double") / F.col("__P").cast("double")
    )
    return out.select(
        F.col("__s").alias("threshold"),
        (F.col("__np") + F.col("__nn")).cast("long").alias("n_at"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        dround(precision, round_to).alias("precision"),
        dround(recall, round_to).alias("recall"),
    )


#: Average precision is accumulated in integer units of 1e-12 so the
#: cross-partition sum is exact (double addition order differs between
#: partitions and engines); the quantization error is <= #distinct-scores
#: x 1e-12, far below the reported rounding.
_AP_UNITS = 10**12


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact average precision (area under the step-wise PR curve,
    the standard threshold-sweep definition): ``AP = Σ_g (np_g / P) ·
    precision_g`` over distinct-score groups g in descending order,
    where ``precision_g = tp_g / (tp_g + fp_g)`` at the group boundary.
    One row ``(average_precision, n_pos, n_neg)``.

    Scale shape mirrors :func:`roc_auc`: per-score collapse, distributed
    prefix sums, then ONE aggregation. Each group's term is floored to
    integer units of 1e-12 with pure DECIMAL(38) arithmetic
    (``(a − a mod b) / b`` — exact floor division in both engines), so
    the final sum is an exact integer and the result reproduces
    bit-for-bit across engines and partitionings.
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
        per_score, [F.col("__s").desc()], ["__np", "__nn"]
    )
    tot = per_score.agg(
        F.sum("__np").alias("__P"), F.sum("__nn").alias("__N")
    )
    dec = "decimal(38,0)"
    tp = F.col("cum___np").cast(dec)
    cum_tot = (F.col("cum___np") + F.col("cum___nn")).cast(dec)
    # a / b in exact integer units: a = np·tp·UNITS, b = P·cum_tot
    a = (
        F.col("__np").cast(dec)
        * tp
        * F.lit(_AP_UNITS).cast(dec)
    )
    b = F.col("__P").cast(dec) * cum_tot
    term = F.when(b > 0, (a - F.pmod(a, b)) / b).otherwise(F.lit(0).cast(dec))
    agg = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("__P", "__N")
        .agg(F.sum(term.cast(dec)).alias("__ap_units"))
    )
    # no positive labels => AP is undefined (mirror roc_auc's NULL), not 0.0
    ap = F.when(
        F.col("__P") > 0,
        F.col("__ap_units").cast("double") / F.lit(float(_AP_UNITS)),
    )
    return agg.select(
        dround(ap, round_to).alias("average_precision"),
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
    )


def threshold_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds,
    round_to: int = 6,
) -> DataFrame:
    """Precision / recall / F1 at each candidate threshold, ALL from one
    scan: every threshold's TP/FP/FN are conditional sums in a single
    aggregate (map-side combined — state is 3·|thresholds| longs), then
    the ratios are row-local. One row per threshold:
    ``(threshold, tp, fp, fn, precision, recall, f1)``; predictions use
    ``score >= threshold``. The operating-point sweep you run before
    fixing the curation classifier's cut.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.select(s.alias("__s"), y.alias("__y")).where(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("__s") >= F.lit(float(t))
        aggs += [
            F.sum((pred & (F.col("__y") == 1)).cast("long")).alias(f"__tp_{i}"),
            F.sum((pred & (F.col("__y") == 0)).cast("long")).alias(f"__fp_{i}"),
            F.sum(((~pred) & (F.col("__y") == 1)).cast("long")).alias(f"__fn_{i}"),
        ]
    one = base.agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"__tp_{i}").alias("tp"),
                F.col(f"__fp_{i}").alias("fp"),
                F.col(f"__fn_{i}").alias("fn"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    rows = one.select(F.explode(per).alias("m")).select("m.*")
    tp, fp, fn = (F.col(c).cast("double") for c in ("tp", "fp", "fn"))
    precision = F.when(tp + fp > 0, tp / (tp + fp))
    recall = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (precision + recall > 0),
        2 * precision * recall / (precision + recall),
    )
    return rows.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        dround(precision, round_to).alias("precision"),
        dround(recall, round_to).alias("recall"),
        dround(f1, round_to).alias("f1"),
    )


def decile_lift(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Lift/gains-chart data: rank by score DESCENDING into ``n_bins``
    equal-frequency buckets (bucket 1 = highest scores) via the
    distributed global rank, then per bucket the positive rate and
    lift = bucket rate / overall rate — "how much better than random is
    the top decile" — plus the cumulative gain (share of all positives
    captured down to this bucket). One row per bucket. ``id_col`` breaks
    score ties so bucket assignment is total and reproducible (never a
    partition-layout-dependent tiebreak).
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        quantile_bin,
    )

    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
        F.col(id_col).alias("__tb"),
    ).where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    # descending score order = ascending (-score); tiebreak keeps the
    # order total
    binned = quantile_bin(
        base.withColumn("__neg_s", -F.col("__s")),
        "__neg_s",
        n_bins,
        out_col="bucket",
        tiebreak_cols=["__tb"],
    )
    per = binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").alias("__N"), F.sum("n_pos").alias("__P")
    )
    pt = per.crossJoin(F.broadcast(tot))
    # cumulative positives over the ≤ n_bins bucket rows via a broadcast
    # triangular self-join (no unpartitioned window, same trick as the
    # rank offsets)
    a, b = pt.alias("__dl_a"), per.alias("__dl_b")
    cum = (
        a.join(
            F.broadcast(b),
            F.col("__dl_b.bucket") <= F.col("__dl_a.bucket"),
        )
        .groupBy(
            F.col("__dl_a.bucket").alias("bucket"),
            F.col("__dl_a.n").alias("n"),
            F.col("__dl_a.n_pos").alias("n_pos"),
            F.col("__dl_a.__N").alias("__N"),
            F.col("__dl_a.__P").alias("__P"),
        )
        .agg(F.sum(F.col("__dl_b.n_pos")).alias("__cum_pos"))
    )
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    overall = F.col("__P").cast("double") / F.col("__N").cast("double")
    return cum.select(
        "bucket",
        "n",
        "n_pos",
        dround(rate, round_to).alias("positive_rate"),
        dround(F.when(overall > 0, rate / overall), round_to).alias("lift"),
        dround(
            F.when(
                F.col("__P") > 0,
                F.col("__cum_pos").cast("double") / F.col("__P").cast("double"),
            ),
            round_to,
        ).alias("cumulative_gain"),
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


def feature_auc_screen(
    df: DataFrame,
    feature_cols: "list[str]",
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Univariate feature screening: the exact ROC-AUC of EVERY feature
    column against the label in one shared plan — one row per feature,
    ``(feature, auc, n_pos, n_neg)``, the single-pass filter ranking a
    feature-store user runs before training (|auc − 0.5| is the
    screening signal; 0.5 = no ranking power).

    Same Mann–Whitney rank formulation as :func:`roc_auc`, generalized
    to grouped prefix sums WITHOUT a per-feature single-task sort: one
    ``stack`` unpivot, per-(feature, value) count collapse, then ONE
    `attach_global_cumsum` ordered by ``(feature, value)`` — the range
    exchange interleaves every feature's distinct values across tasks,
    so a single continuous feature with billions of distinct values
    still spreads over the cluster. Per-feature cumulative = global
    cumulative − the feature's start offset (a per-feature ``min(cum −
    own)`` aggregation, exact integers). A window PARTITIONED BY
    feature would put each feature's whole distinct-value set in one
    task — the shape this avoids.
    """
    if not feature_cols:
        raise ValueError("feature_auc_screen requires >= 1 feature column")
    lab = F.col(label_col).cast("int")
    from databricks_demo_feature_store_spark.functions.strings import (
        sql_identifier,
        sql_string_literal,
    )

    stack_expr = "stack({n}, {args}) as (__f, __s)".format(
        n=len(feature_cols),
        args=", ".join(
            f"'{sql_string_literal(c)}', CAST({sql_identifier(c)} AS DOUBLE)"
            for c in feature_cols
        ),
    )
    base = df.select(lab.alias("__y"), F.expr(stack_expr)).where(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    per = base.groupBy("__f", "__s").agg(
        F.sum("__y").alias("__np"),
        F.sum(F.lit(1) - F.col("__y")).alias("__nn"),
    )
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_cumsum,
    )

    cum = attach_global_cumsum(
        per, [F.col("__f").asc(), F.col("__s").asc()], ["__np", "__nn"]
    )
    # cumulative BEFORE each feature's first row = min over the feature
    # of (inclusive cum − own count); subtracting localizes the ranks
    offs = cum.groupBy("__f").agg(
        F.min(F.col("cum___np") - F.col("__np")).alias("__onp"),
        F.min(F.col("cum___nn") - F.col("__nn")).alias("__onn"),
        F.sum("__np").alias("__P"),
        F.sum("__nn").alias("__N"),
    )
    dec = "decimal(38,0)"
    j = cum.join(offs, "__f")
    lnp = (F.col("cum___np") - F.col("__onp")).cast(dec)
    lnn = (F.col("cum___nn") - F.col("__onn")).cast(dec)
    n_s = (F.col("__np") + F.col("__nn")).cast(dec)
    ranks_before = lnp + lnn - n_s
    dbl_avg_rank = F.lit(2).cast(dec) * ranks_before + n_s + F.lit(1).cast(dec)
    contrib = F.col("__np").cast(dec) * dbl_avg_rank
    agg = j.groupBy("__f", "__P", "__N").agg(F.sum(contrib).alias("__2R"))
    p = F.col("__P").cast(dec)
    numer = F.col("__2R") - p * (p + F.lit(1).cast(dec))
    auc = F.when(
        (F.col("__P") > 0) & (F.col("__N") > 0),
        numer.cast("double")
        / (F.lit(2.0) * F.col("__P").cast("double") * F.col("__N").cast("double")),
    )
    return agg.select(
        F.col("__f").alias("feature"),
        dround(auc, round_to).alias("auc"),
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement (Cohen 1960) between two
    label columns — one row ``(kappa, p_observed, p_expected, n)``. The
    quality loop for human- or model-labeled training data: raw percent
    agreement overstates consistency when the label distribution is
    skewed; kappa subtracts the chance-agreement floor
    (``κ = (p_o − p_e) / (1 − p_e)``).

    One hash aggregation over (a, b) pairs — state is the label-pair
    cross product, never rows. Marginals come from the same collapsed
    frame; every statistic is one division of exact integer counts
    (``p_e`` is Σ n_a·n_b over labels ÷ n², kept in DECIMAL(38)), so
    the result is engine-exact. Rows where either label is NULL are
    dropped (emit an explicit '__null__' category upstream to count
    them). κ is NULL when p_e = 1 (both raters constant — undefined)."""
    a, b = F.col(rater_a_col).cast("string"), F.col(rater_b_col).cast("string")
    base = df.select(a.alias("__a"), b.alias("__b")).where(
        F.col("__a").isNotNull() & F.col("__b").isNotNull()
    )
    cell = base.groupBy("__a", "__b").agg(F.count("*").alias("__c"))
    dec = "decimal(38,0)"
    tot = cell.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c")).otherwise(0)).alias(
            "__agree"
        ),
    )
    ma = cell.groupBy("__a").agg(F.sum("__c").alias("__na"))
    mb = cell.groupBy("__b").agg(F.sum("__c").alias("__nb"))
    # Σ_k n_a(k)·n_b(k): join the two marginal frames on the label value
    pe_num = (
        ma.join(mb, ma["__a"] == mb["__b"], "inner")
        .select((F.col("__na").cast(dec) * F.col("__nb").cast(dec)).alias("__ab"))
        .agg(F.coalesce(F.sum("__ab"), F.lit(0).cast(dec)).alias("__pe_num"))
    )
    j = tot.crossJoin(F.broadcast(pe_num))
    n = F.col("__n").cast(dec)
    po = F.col("__agree").cast("double") / F.col("__n").cast("double")
    pe = F.col("__pe_num").cast("double") / (
        F.col("__n").cast("double") * F.col("__n").cast("double")
    )
    # κ = (po − pe)/(1 − pe) with exact-integer numerators:
    # (agree·n − pe_num) / (n² − pe_num)
    kap_num = F.col("__agree").cast(dec) * n - F.col("__pe_num")
    kap_den = n * n - F.col("__pe_num")
    kappa = F.when(
        kap_den > 0, kap_num.cast("double") / kap_den.cast("double")
    )
    return j.select(
        dround(kappa, round_to).alias("kappa"),
        dround(po, round_to).alias("p_observed"),
        dround(pe, round_to).alias("p_expected"),
        F.col("__n").cast("long").alias("n"),
    )
