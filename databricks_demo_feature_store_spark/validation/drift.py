"""Distribution-drift statistics between a current and a reference slice
of a feature — the monitoring tier above `monitor.dimension_drift`'s
row-count gate (reference `src/packages/data_validation/monitor.py`
checks counts only; production feature monitoring also needs SHAPE
drift before a model silently degrades).

Two standard statistics, both exact and both oracle-replayable:

- :func:`psi_drift` — Population Stability Index over a categorical
  column: ``Σ (p_cur - p_ref) · ln(p_cur / p_ref)`` with Laplace
  smoothing so categories present on only one side stay finite. The
  conventional alert levels are 0.1 (drifting) / 0.25 (major shift).
- :func:`ks_drift` — the exact two-sample Kolmogorov–Smirnov statistic
  over a numeric column: ``D = max_x |CDF_cur(x) - CDF_ref(x)|``.

Scale shape: PSI is two map-side-combinable category aggregations joined
on the (small) category key — the raw slices never co-shuffle. KS needs
full CDFs, i.e. global running sums — built with
``attach_global_cumsum`` (range-partitioned prefix sums, broadcast
offsets), NEVER a single-partition ``sum().over(Window.orderBy())``; the
max-gap comparison is kept in exact integer/DECIMAL cross-products
(``|cum_cur·n_ref - cum_ref·n_cur|``) so both engines agree bit-for-bit
before the single final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def psi_drift(
    cur: DataFrame,
    ref: DataFrame,
    column: str,
    round_to: int = 6,
) -> DataFrame:
    """One-row PSI between the category distributions of ``column`` in
    ``cur`` vs ``ref``: ``(column, psi, n_categories, n_cur, n_ref)``.

    Smoothing: ``p = (count + 0.5) / (total + 0.5·K)`` with K = number
    of distinct categories across both sides (NULL is its own
    category), so one-sided categories contribute a finite penalty
    instead of an infinite log ratio.
    """
    cat = F.coalesce(F.col(column).cast("string"), F.lit("__null__"))
    c = cur.groupBy(cat.alias("category")).agg(F.count(F.lit(1)).alias("n_cur"))
    r = ref.groupBy(cat.alias("category")).agg(F.count(F.lit(1)).alias("n_ref"))
    j = (
        c.join(r, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        )
    )
    tot = j.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_cur").alias("tot_cur"),
        F.sum("n_ref").alias("tot_ref"),
    )
    jt = j.crossJoin(F.broadcast(tot))
    p_cur = (F.col("n_cur") + F.lit(0.5)) / (
        F.col("tot_cur") + F.lit(0.5) * F.col("k")
    )
    p_ref = (F.col("n_ref") + F.lit(0.5)) / (
        F.col("tot_ref") + F.lit(0.5) * F.col("k")
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        jt.groupBy("k", "tot_cur", "tot_ref")
        .agg(F.sum(term).alias("__psi"))
        .select(
            F.lit(column).alias("column"),
            dround(F.col("__psi"), round_to).alias("psi"),
            F.col("k").cast("int").alias("n_categories"),
            F.col("tot_cur").cast("long").alias("n_cur"),
            F.col("tot_ref").cast("long").alias("n_ref"),
        )
    )


def psi_numeric(
    cur: DataFrame,
    ref: DataFrame,
    column: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """PSI for a CONTINUOUS feature: fit ``n_bins`` equal-frequency
    cutpoints on the REFERENCE slice (exact percentiles, one aggregate
    row), bin both slices with the broadcast cutpoints (per-row fold,
    neither slice shuffles for the binning), then score the binned
    distributions with the categorical PSI. Returns the same one-row
    shape as :func:`psi_drift` with ``column`` labelling the feature.
    NULLs form their own bin — a NULL-rate shift is drift.

    Fitting on the reference (not the union) is deliberate: the
    reference defines the expected distribution, and the fitted bins
    stay FIXED as new current slices arrive, so PSI series over time are
    comparable point to point.
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        assign_bins,
    )

    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = ref.agg(
        F.percentile(
            F.col(column).cast("double"),
            F.array(*[F.lit(float(q)) for q in qs]),
        ).alias("__q")
    ).select(F.explode("__q").alias("cutpoint"))
    cur_b = assign_bins(cur, column, cuts, out_col="__bin")
    ref_b = assign_bins(ref, column, cuts, out_col="__bin")
    out = psi_drift(cur_b, ref_b, "__bin", round_to=round_to)
    return out.select(
        F.lit(column).alias("column"),
        "psi",
        "n_categories",
        "n_cur",
        "n_ref",
    )


def psi_by_group(
    cur_counts: DataFrame,
    ref_counts: DataFrame,
    group_col: str = "window_start",
    category_col: str = "category",
    n_col: str = "n",
    round_to: int = 6,
) -> DataFrame:
    """PSI per group (e.g. per time window) from pre-aggregated category
    counts against ONE reference distribution — the batch finisher of
    the streaming drift monitor (`streaming/ops.py
    windowed_category_counts` maintains the counts; this turns each
    completed window into a PSI point for alerting). Returns one row
    per group: ``(group, psi, n_categories, n_cur, n_ref)``.

    Same Laplace smoothing as :func:`psi_drift`, with K = distinct
    categories across the reference and THAT group. Everything here
    runs on aggregated (group × category) frames — broadcast-sized by
    construction.
    """
    # union + re-aggregate instead of a full-outer self-join: the grid
    # branch and the current branch share the cur_counts lineage (e.g. a
    # streaming memory sink), and a self-join over that trips attribute
    # dedup; the union shape has no such conflict and one fewer join.
    wins = cur_counts.select(group_col).distinct()
    grid = wins.crossJoin(
        F.broadcast(
            ref_counts.select(
                F.col(category_col).alias(category_col),
                F.col(n_col).alias("__ref_n"),
            )
        )
    ).select(
        group_col,
        category_col,
        F.lit(0).cast("long").alias("__n_cur"),
        F.col("__ref_n").cast("long").alias("__n_ref"),
    )
    cur = cur_counts.select(
        group_col,
        category_col,
        F.col(n_col).cast("long").alias("__n_cur"),
        F.lit(0).cast("long").alias("__n_ref"),
    )
    j = (
        grid.unionByName(cur)
        .groupBy(group_col, category_col)
        .agg(
            F.sum("__n_cur").alias("__n_cur"),
            F.sum("__n_ref").alias("__n_ref"),
        )
    )
    # per-group totals via a PARTITIONED window over the aggregated
    # (group × category) frame — no tots-side self-join (same
    # MemorySink-lineage pitfall as above) and no extra shuffle beyond
    # the group clustering
    from pyspark.sql import Window as W

    wg = W.partitionBy(group_col)
    jt = j.select(
        group_col,
        category_col,
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
        jt.groupBy(group_col, "__k", "__tot_cur", "__tot_ref")
        .agg(F.sum(term).alias("__psi"))
        .select(
            group_col,
            dround(F.col("__psi"), round_to).alias("psi"),
            F.col("__k").cast("int").alias("n_categories"),
            F.col("__tot_cur").cast("long").alias("n_cur"),
            F.col("__tot_ref").cast("long").alias("n_ref"),
        )
    )


def count_anomalies(
    df: DataFrame,
    ts_col: str,
    trailing: int = 6,
    z_threshold: float = 3.0,
    grain: str = "month",
    round_to: int = 6,
) -> DataFrame:
    """Volume-anomaly flags on the period row-count series: each
    period's count is z-scored against the TRAILING ``trailing`` periods
    (current excluded — an anomaly must not dilute its own baseline);
    ``|z| > z_threshold`` flags it. Returns
    ``(period, n_rows, baseline_mean, zscore, is_anomaly)``; the first
    periods (no 2-period baseline yet) carry NULL z-scores and are never
    flagged.

    The raw table collapses to one row per period FIRST (map-side
    combined count), so the trailing window runs over the tiny
    aggregated series — the one place an unpartitioned window is the
    right plan (and what the audit's aggregated-input exemption is
    for).
    """
    if grain not in ("month", "week", "day"):
        raise ValueError(f"count_anomalies grain must be month|week|day, got {grain!r}")
    period = (
        F.trunc(F.col(ts_col).cast("date"), grain)
        if grain != "day"
        else F.col(ts_col).cast("date")
    )
    counts = df.groupBy(period.alias("period")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return anomalies_from_counts(
        counts, trailing=trailing, z_threshold=z_threshold, round_to=round_to
    )


def anomalies_from_counts(
    counts: DataFrame,
    period_col: str = "period",
    n_col: str = "n_rows",
    trailing: int = 6,
    z_threshold: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """The scoring stage of :func:`count_anomalies` for
    PRE-AGGREGATED period counts — e.g. the streaming monitor's
    windowed counts (`streaming/ops.py hourly_counts` /
    `windowed_category_counts`) replayed through `run_available_now` or
    a foreachBatch sink: each completed window becomes an anomaly point
    without re-scanning raw events. Same trailing-z-score semantics and
    output shape, with ``period``/``n_rows`` taken from the given
    columns."""
    from pyspark.sql import Window as W

    base = counts.select(
        F.col(period_col).alias("period"),
        F.col(n_col).alias("n_rows"),
    )
    w = W.orderBy("period").rowsBetween(-trailing, -1)
    mean = F.avg(F.col("n_rows").cast("double")).over(w)
    std = F.stddev_samp(F.col("n_rows").cast("double")).over(w)
    z = F.when(std > 0, (F.col("n_rows").cast("double") - mean) / std)
    # a ZERO-variance baseline (constant trailing counts) makes any
    # deviation an automatic anomaly: z is undefined (NULL) there, but
    # the flag must still fire — a flat-quota source dropping to 0 is
    # the monitor's headline case, not a pass
    flat_break = (
        (std == 0)
        & mean.isNotNull()
        & (F.col("n_rows").cast("double") != mean)
    )
    return base.select(
        "period",
        "n_rows",
        dround(mean, round_to).alias("baseline_mean"),
        dround(z, round_to).alias("zscore"),
        (
            F.coalesce(F.abs(z) > F.lit(float(z_threshold)), F.lit(False))
            | F.coalesce(flat_break, F.lit(False))
        ).alias("is_anomaly"),
    )


def ks_drift(
    cur: DataFrame,
    ref: DataFrame,
    column: str,
    round_to: int = 6,
) -> DataFrame:
    """One-row exact two-sample KS statistic for numeric ``column``:
    ``(column, ks_stat, n_cur, n_ref)``. NULLs are dropped (a NULL has
    no place on a CDF); drift in NULL *rates* is :func:`psi_drift`'s
    job.

    Exactness: per-value counts → distributed prefix sums over the value
    order → the gap is maximized as the integer cross-product
    ``|cum_cur·n_ref - cum_ref·n_cur|`` (DECIMAL(38) so 100 TB row
    counts can't overflow); only the final max divides by
    ``n_cur·n_ref``.
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_cumsum,
    )

    v = F.col(column).cast("double")
    a = cur.select(v.alias("v")).where(F.col("v").isNotNull()).select(
        "v", F.lit(1).alias("one_cur"), F.lit(0).alias("one_ref")
    )
    b = ref.select(v.alias("v")).where(F.col("v").isNotNull()).select(
        "v", F.lit(0).alias("one_cur"), F.lit(1).alias("one_ref")
    )
    counts = (
        a.unionByName(b)
        .groupBy("v")
        .agg(
            F.sum("one_cur").alias("n_cur"),
            F.sum("one_ref").alias("n_ref"),
        )
    )
    cdf = attach_global_cumsum(counts, [F.col("v").asc()], ["n_cur", "n_ref"])
    tot = counts.agg(
        F.sum("n_cur").alias("tot_cur"), F.sum("n_ref").alias("tot_ref")
    )
    dec = "decimal(38,0)"
    gap = F.abs(
        F.col("cum_n_cur").cast(dec) * F.col("tot_ref").cast(dec)
        - F.col("cum_n_ref").cast(dec) * F.col("tot_cur").cast(dec)
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("tot_cur", "tot_ref")
        .agg(F.max(gap).alias("__gap"))
        .select(
            F.lit(column).alias("column"),
            dround(
                F.col("__gap").cast("double")
                / (F.col("tot_cur").cast("double") * F.col("tot_ref").cast("double")),
                round_to,
            ).alias("ks_stat"),
            F.col("tot_cur").cast("long").alias("n_cur"),
            F.col("tot_ref").cast("long").alias("n_ref"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    grain: str = "day",
    slack: float = 0.5,
    threshold: float = 5.0,
    round_to: int = 6,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection on the period row-count
    series (Page 1954): standardize each period's count against the
    whole series, then track the one-sided cumulative sums
    ``S⁺_t = max(0, S⁺_{t−1} + z_t − slack)`` and
    ``S⁻_t = max(0, S⁻_{t−1} − z_t − slack)``; a period where either
    exceeds ``threshold`` is a level-shift alarm. CUSUM accumulates
    small persistent shifts that the per-period z-test
    (:func:`count_anomalies`) never flags — the two are complementary
    monitors. Returns ``(period, n_rows, zscore, cusum_pos, cusum_neg,
    is_changepoint)``.

    Scale shape: the raw table collapses to one row per period first
    (map-side combined count); all recursions run on that tiny series
    via the reset-free identity ``S_t = C_t − min(0, min_{j≤t} C_j)``
    where C is the plain cumulative sum of ``(±z − slack)`` — windows
    over the aggregated series only (the audit's aggregated-input
    exemption, same as :func:`count_anomalies`). Mean/std come from
    exact integer count sums; every per-period term is rounded to 9
    decimals and cumulated in DECIMAL(38,9), so alarms are
    engine-exact.
    """
    if grain not in ("month", "week", "day"):
        raise ValueError(f"cusum_changepoints grain must be month|week|day, got {grain!r}")
    period = (
        F.trunc(F.col(ts_col).cast("date"), grain)
        if grain != "day"
        else F.col(ts_col).cast("date")
    )
    counts = df.groupBy(period.alias("period")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return cusum_from_counts(
        counts, slack=slack, threshold=threshold, round_to=round_to
    )


def cusum_from_counts(
    counts: DataFrame,
    period_col: str = "period",
    n_col: str = "n_rows",
    slack: float = 0.5,
    threshold: float = 5.0,
    round_to: int = 6,
) -> DataFrame:
    """The CUSUM statistic over an ALREADY-AGGREGATED period-count
    series — the batch finisher behind :func:`cusum_changepoints`, and
    the piece a streaming monitor reuses on top of engine-maintained
    windowed counts (split responsibility: the stream keeps the counts,
    this computes the alarm frame). Semantics as
    :func:`cusum_changepoints`."""
    from pyspark.sql import Window as W

    counts = counts.select(
        F.col(period_col).alias("period"), F.col(n_col).alias("n_rows")
    )
    stats = counts.agg(
        F.count("*").alias("__k"),
        F.sum("n_rows").alias("__s1"),
        F.sum(F.col("n_rows") * F.col("n_rows")).alias("__s2"),
    )
    dec = "decimal(38,9)"
    k = F.col("__k").cast("double")
    mean = F.col("__s1").cast("double") / k
    var = F.when(
        F.col("__k") > 1,
        (F.col("__s2").cast("double") - F.col("__s1").cast("double") * mean)
        / (k - F.lit(1.0)),
    )
    base = counts.crossJoin(F.broadcast(stats)).select(
        "period",
        "n_rows",
        F.when(
            F.sqrt(var) > 0, (F.col("n_rows").cast("double") - mean) / F.sqrt(var)
        ).alias("__z"),
    )
    # Quantize the (irrational) z-score to integer NANO-units with PURE
    # double ops — floor(z·1e9 + 0.5) — which both engines evaluate
    # bit-identically (IEEE multiply/add/floor on the same double).
    # The previous dround(z, 9) quantized through a double→DECIMAL cast,
    # which is engine-DEPENDENT at the 1e-9 boundaries (Spark rounds the
    # shortest repr, DuckDB the binary value); one flipped nano-unit then
    # propagated through the running sum and flipped the 6th decimal of a
    # RUN of output rows (measured at sf0.1, round 12). Everything after
    # the quantization is exact integer arithmetic.
    nano = 1_000_000_000
    slack_u = int(round(float(slack) * nano))
    thresh_u = int(round(float(threshold) * nano))
    zq = F.floor(
        F.coalesce(F.col("__z"), F.lit(0.0)) * F.lit(float(nano)) + F.lit(0.5)
    ).cast("long")
    up = zq - F.lit(slack_u)
    dn = -zq - F.lit(slack_u)
    w = W.orderBy("period").rowsBetween(W.unboundedPreceding, 0)
    cum = base.select(
        "*",
        F.sum(up).over(w).alias("__cu"),
        F.sum(dn).over(w).alias("__cd"),
    )
    zero = F.lit(0).cast("long")
    cum = cum.select(
        "*",
        F.least(zero, F.min("__cu").over(w)).alias("__mu"),
        F.least(zero, F.min("__cd").over(w)).alias("__md"),
    )
    from databricks_demo_feature_store_spark.functions.rounding import (
        decimal_half_up_div,
    )

    rscale = 10 ** (9 - round_to)
    s_pos = decimal_half_up_div(
        F.col("__cu") - F.col("__mu"), F.lit(rscale)
    ).cast("double") / F.lit(float(10**round_to))
    s_neg = decimal_half_up_div(
        F.col("__cd") - F.col("__md"), F.lit(rscale)
    ).cast("double") / F.lit(float(10**round_to))
    zs = F.when(
        F.col("__z").isNotNull(),
        F.floor(
            F.col("__z") * F.lit(float(10**round_to)) + F.lit(0.5)
        ).cast("long").cast("double")
        / F.lit(float(10**round_to)),
    )
    return cum.select(
        "period",
        F.col("n_rows").cast("long").alias("n_rows"),
        zs.alias("zscore"),
        s_pos.alias("cusum_pos"),
        s_neg.alias("cusum_neg"),
        (
            (F.col("__cu") - F.col("__mu") > F.lit(thresh_u))
            | (F.col("__cd") - F.col("__md") > F.lit(thresh_u))
        ).alias("is_changepoint"),
    )
