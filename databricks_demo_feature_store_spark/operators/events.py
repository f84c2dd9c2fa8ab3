"""Event-sequence analytics: ordered funnels and retention cohorts.

The product-analytics tier over an event stream — the batch twins of what
the reference's validation notebooks eyeball by hand, expressed as plain
aggregations so they run at any event volume.

Scale shape: both operators are per-user hash aggregations; the funnel is
ONE grouped pass — events shuffle exactly once (the ``groupBy(user_id)``
exchange), each user's step-typed events are collected, sorted in-array
(a JVM expression, not a sort node), and a single ``F.aggregate`` fold
walks them once filling step slots — never a per-step join or re-shuffle
of the raw events. Retention is one aggregation plus an explode of each
user's bounded distinct-period array; never a users×periods cross join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Ordered funnel: per user, the first timestamp of step 1, the first
    step-2 AFTER that, the first step-3 after THAT, and so on —
    ``(user, step1_ts, …, stepN_ts, steps_completed)``; a later step is
    NULL (and uncounted) unless every earlier step happened before it
    (strictly — an equal-timestamp event does not advance the funnel).

    Single-pass form: ONE ``groupBy(user_id)`` collects each user's
    DISTINCT step-typed ``(ts, type)`` events (non-step types are
    dropped before collection; duplicates collapse inside the
    aggregation buffer — including map-side, so a bot replaying the
    same event a million times never shuffles or stores more than one
    copy), ``array_sort`` orders them by time inside the row, and one
    ``F.aggregate`` fold walks the array filling an N-slot timestamp
    state — an event fills the EARLIEST unfilled slot whose type
    matches and whose predecessor slot is already filled with a
    strictly earlier time. Dropping ``(ts, type)`` duplicates is
    semantics-preserving: advancement requires a STRICTLY earlier
    predecessor, so of two identical events at most one can ever fill
    a slot and the other can never ride on it. The raw events shuffle
    exactly once; there is no per-step join, no window, no sort node.

    Per-user state is the user's distinct funnel-event set. For
    adversarial actors with huge numbers of DISTINCT timestamps,
    ``max_events_per_user`` caps the fold input to the EARLIEST k
    events after sorting; the greedy funnel fills earliest-first, so a
    truncated user can only under-report steps completed AFTER their
    k-th funnel event (their row carries ``truncated = true`` when the
    cap bit). Default ``None`` = exact.
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    n = len(steps)
    cur = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    per_user = cur.groupBy("user_id").agg(
        F.array_sort(
            F.collect_set(
                F.when(
                    F.col("__t").isin(*[str(s) for s in steps]),
                    F.struct(
                        F.col("__ts").alias("ts"), F.col("__t").alias("t")
                    ),
                )
            )
        ).alias("__evs")
    )
    if max_events_per_user is not None:
        if max_events_per_user < 1:
            raise ValueError("max_events_per_user must be >= 1")
        per_user = per_user.select(
            "user_id",
            F.slice("__evs", 1, int(max_events_per_user)).alias("__evs"),
            (F.size("__evs") > int(max_events_per_user)).alias("truncated"),
        )

    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(n)])

    def _advance(state, ev):
        slots = [F.element_at(state, k + 1) for k in range(n)]
        fills = []
        for k in range(n):
            cond = slots[k].isNull() & (ev["t"] == F.lit(str(steps[k])))
            if k > 0:
                cond = cond & slots[k - 1].isNotNull() & (ev["ts"] > slots[k - 1])
            for earlier in fills:  # one event advances at most one slot
                cond = cond & ~earlier
            fills.append(cond)
        return F.array(
            *[
                F.when(fills[k], ev["ts"]).otherwise(slots[k])
                for k in range(n)
            ]
        )

    final = F.aggregate(F.col("__evs"), init, _advance)
    extra = ["truncated"] if max_events_per_user is not None else []
    out = per_user.select("user_id", final.alias("__st"), *extra)
    completed = sum(
        F.element_at(F.col("__st"), i).isNotNull().cast("int")
        for i in range(1, n + 1)
    )
    return out.select(
        "user_id",
        *[
            F.element_at(F.col("__st"), i).alias(f"step{i}_ts")
            for i in range(1, n + 1)
        ],
        completed.alias("steps_completed"),
        *extra,
    )


def time_decay_agg(
    events: DataFrame,
    reference_ts: str,
    half_life_days: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int = 6,
) -> DataFrame:
    """Exponentially time-decayed per-entity aggregates — the recency
    weighting every behavioral feature store wants: an event ``d`` days
    before ``reference_ts`` counts with weight ``0.5^(d / half_life)``.
    Returns ``(user_id, decayed_count, decayed_value)``; events after
    the reference timestamp are excluded (they haven't happened yet at
    feature time — the leakage rule).

    One hash aggregation with map-side combine; per-term weights are
    quantized through DECIMAL before summing, so the result is
    independent of partition summation order AND of last-ulp libm
    differences between engines (a raw double sum of ``exp`` terms is
    neither).
    """
    ref = F.lit(reference_ts).cast("timestamp")
    age_days = (
        ref.cast("double") - F.col(ts_col).cast("timestamp").cast("double")
    ) / F.lit(86400.0)
    w = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days)))
    wdec = w.cast("decimal(25,10)")
    vdec = (F.col(value_col).cast("double") * w).cast("decimal(25,10)")
    return (
        events.where(F.col(ts_col) <= ref)
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            dround(F.sum(wdec).cast("double"), round_to).alias("decayed_count"),
            dround(F.sum(vdec).cast("double"), round_to).alias("decayed_value"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    start_label: str = "__start__",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: one row per ``(from_type, to_type)`` with the transition
    count and the row-normalized probability (``P(to | from)``). Every
    user's first event transitions from ``start_label``, so session
    entry points are part of the matrix.

    One per-user partitioned ``lag`` (deterministic (ts, id) order)
    tags each event with its predecessor type, then a single pair
    aggregation with map-side combine; the probability join is against
    the tiny per-from_type margin. State scales with distinct type
    PAIRS, never users or events. NULL event types count as their own
    '__null__' category BEFORE the lag — a NULL-typed predecessor is a
    real predecessor, not a session start (the same NULL convention as
    psi_drift / chi2_association / key_skew_profile).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(F.col(user_col)).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    cat = F.coalesce(F.col(type_col).cast("string"), F.lit("__null__"))
    pairs = events.select(
        F.coalesce(F.lag(cat).over(w), F.lit(start_label)).alias(
            "from_type"
        ),
        cat.alias("to_type"),
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    margins = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__row_total")
    )
    return counts.join(F.broadcast(margins), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        dround(
            F.col("n_transitions").cast("double")
            / F.col("__row_total").cast("double"),
            round_to,
        ).alias("probability"),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    direct_label: str = "direct",
) -> DataFrame:
    """Last-touch conversion attribution: every ``conversion_type``
    event is credited to the user's most recent STRICTLY PRECEDING
    non-conversion event type (the "channel"); conversions with no
    prior touch credit ``direct_label``. Output is one row per channel:
    ``(channel, n_conversions, total_value)``.

    One per-user window (partitioned — state scales with users, never a
    global sort) computes ``last(non-conversion type, ignorenulls)``
    over the frame ``(unbounded preceding, -1)``; ``(ts, event_id)``
    ordering makes the credit deterministic under same-timestamp
    events. The value sum routes through DECIMAL so the per-channel
    totals are engine-reproducible.

    NULL-typed events ARE touches, credited to the ``'__null__'``
    channel — the same NULL-is-a-real-category convention
    :func:`event_transitions` documents for all event-sequence
    operators (without the coalesce, ``type != conversion`` is NULL
    for NULL types and ``last(ignorenulls)`` would silently skip them,
    mis-crediting such conversions to ``direct``).
    """
    from pyspark.sql import Window as W

    typed = F.coalesce(F.col(type_col).cast("string"), F.lit("__null__"))
    w = (
        W.partitionBy(F.col(user_col))
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(typed != conversion_type, typed),
        ignorenulls=True,
    ).over(w)
    conv = (
        events.select(
            F.col(user_col),
            F.col(type_col),
            F.col(value_col),
            channel.alias("__channel"),
        )
        .where(F.col(type_col) == conversion_type)
    )
    return (
        conv.groupBy(
            F.coalesce(F.col("__channel"), F.lit(direct_label)).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col(value_col).cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
        )
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


def position_attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    first_weight: float = 0.4,
    last_weight: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """U-shaped (position-based) MULTI-touch attribution: every
    conversion's value splits across ALL the user's touches since the
    previous conversion — first touch ``first_weight``, last touch
    ``last_weight``, the remainder evenly across the middle (a single
    touch takes 1.0; exactly two split 50/50) — the standard corrective
    to last-touch's winner-takes-all bias. Output: one row per channel
    — ``(channel, n_touches, credited_value)``.

    Semantics: a touch belongs to the nearest conversion strictly after
    it in the deterministic (ts, id) order; touches after the user's
    final conversion earn nothing; NULL event types form the
    ``__null__`` channel (never silently dropped).

    Scale shape: ONE descending per-user window carries the next
    conversion back onto each touch (the reversed twin of last-touch's
    carry), one (user, conversion) window ranks the touch run (runs are
    inter-conversion gaps — bounded by user activity, never the table),
    and one hash aggregation rolls channels up. Credit terms round to 9
    decimals and sum as DECIMAL so the total is order-independent and
    engine-exact.
    """
    u, t, ts, eid = (
        F.col(user_col), F.col(type_col), F.col(ts_col), F.col(id_col)
    )
    is_conv = F.coalesce(t == F.lit(conversion_type), F.lit(False))
    w_desc = (
        Window.partitionBy(user_col)
        .orderBy(ts.desc(), eid.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = events.select(
        u.alias("__u"),
        F.coalesce(t.cast("string"), F.lit("__null__")).alias("channel"),
        ts.alias("__ts"),
        eid.alias("__id"),
        is_conv.alias("__is_conv"),
        F.last(
            F.when(
                is_conv,
                F.struct(
                    eid.alias("__cid"), F.col(value_col).alias("__cval")
                ),
            ),
            ignorenulls=True,
        ).over(w_desc).alias("__conv"),
    )
    touches = tagged.where(
        (~F.col("__is_conv")) & F.col("__conv").isNotNull()
    ).select(
        "__u", "channel", "__ts", "__id",
        F.col("__conv.__cid").alias("__cid"),
        F.col("__conv.__cval").alias("__cval"),
    )
    w_run = Window.partitionBy("__u", "__cid")
    w_rank = w_run.orderBy(F.col("__ts").asc(), F.col("__id").asc())
    n = F.count(F.lit(1)).over(
        w_run.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn = F.row_number().over(w_rank)
    fw, lw = F.lit(float(first_weight)), F.lit(float(last_weight))
    weight = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(rn == 1, fw)
        .when(rn == n, lw)
        .otherwise((F.lit(1.0) - fw - lw) / (n - F.lit(2)))
    )
    credited = touches.select(
        "channel",
        dround(weight * F.col("__cval"), 9).alias("__credit"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(F.col("__credit").cast("decimal(25,9)"))
        .cast("double")
        .alias("credited_value"),
    )


def conversion_lag_stats(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Time-to-conversion distribution per FIRST-touch channel: for each
    conversion, the lag in seconds from the first touch of its run (the
    same run definition as :func:`position_attribution` — touches since
    the user's previous conversion), aggregated per channel of that
    first touch: ``(channel, n_conversions, median_lag_sec,
    p90_lag_sec)``. The funnel-latency metric that tells a campaign how
    long its first click takes to pay off. Conversions with no
    preceding touch are excluded (no lag exists).

    Scale shape: the descending carry window assigns touches to their
    conversion, ONE (user, conversion) aggregation takes the min touch
    (first = earliest (ts, id)) — map-side combined — and one grouped
    exact-percentile aggregation collapses channels.
    """
    u, t, ts, eid = (
        F.col(user_col), F.col(type_col), F.col(ts_col), F.col(id_col)
    )
    is_conv = F.coalesce(t == F.lit(conversion_type), F.lit(False))
    w_desc = (
        Window.partitionBy(user_col)
        .orderBy(ts.desc(), eid.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = events.select(
        u.alias("__u"),
        F.coalesce(t.cast("string"), F.lit("__null__")).alias("channel"),
        ts.alias("__ts"),
        eid.alias("__id"),
        is_conv.alias("__is_conv"),
        F.last(
            F.when(
                is_conv,
                F.struct(eid.alias("__cid"), ts.alias("__cts")),
            ),
            ignorenulls=True,
        ).over(w_desc).alias("__conv"),
    )
    touches = tagged.where(
        (~F.col("__is_conv")) & F.col("__conv").isNotNull()
    )
    firsts = touches.groupBy(
        "__u", F.col("__conv.__cid").alias("__cid")
    ).agg(
        F.min(F.struct(F.col("__ts"), F.col("__id"), F.col("channel"))).alias(
            "__first"
        ),
        F.max(F.col("__conv.__cts")).alias("__cts"),
    )
    lags = firsts.select(
        F.col("__first.channel").alias("channel"),
        # microsecond integers, then one IEEE division — sub-second
        # precision preserved and identical in any engine (unix_timestamp
        # would TRUNCATE to seconds and silently disagree with epoch math)
        (
            (
                F.unix_micros(F.col("__cts"))
                - F.unix_micros(F.col("__first.__ts"))
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("__lag"),
    )
    return lags.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        dround(F.percentile(F.col("__lag"), F.lit(0.5)), round_to).alias(
            "median_lag_sec"
        ),
        dround(F.percentile(F.col("__lag"), F.lit(0.9)), round_to).alias(
            "p90_lag_sec"
        ),
    )


def event_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str | None = "event_id",
    depth: int = 3,
    k: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Top-k most common ``depth``-step event-type PATHS across users —
    the path-discovery half of funnel analytics (funnels test a
    hypothesized sequence; this surfaces which sequences actually
    happen). A path is ``depth`` consecutive events of one user in time
    order, e.g. ``view>click>purchase``; overlapping windows all count
    (a 5-event session yields 3 trigram paths).

    One window over (user, time) produces the ``depth−1`` leads — the
    same single per-user sort every sessionize/lag operator here plans —
    then a hash count + TakeOrdered top-k (no global sort).
    ``order_tiebreak`` breaks exact timestamp ties deterministically
    (set None only when (user, ts) is unique). Returns
    ``(path, n_paths, n_users)`` — n_users counts DISTINCT users who
    walked the path, ordered by (n_paths DESC, path ASC).
    """
    if depth < 2:
        raise ValueError("event_paths requires depth >= 2")
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, depth)
    ]
    # EVERY step must be non-null, not just the last lead: concat_ws
    # skips NULLs, so a NULL event type mid-window would otherwise emit
    # a shorter-looking path conflated with genuine (depth-1)-step paths
    complete = steps[0].isNotNull()
    for s in steps[1:]:
        complete = complete & s.isNotNull()
    paths = events.select(
        F.col(user_col).alias("__u"),
        F.concat_ws(sep, *steps).alias("path"),
        complete.alias("__complete"),
    ).filter(F.col("__complete"))
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.count_distinct(F.col("__u")).alias("n_users"),
    )
    return counted.orderBy(F.desc("n_paths"), F.asc("path")).limit(k)


def path_conversion(
    events: DataFrame,
    target: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str | None = "event_id",
    depth: int = 2,
    k: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Path → outcome attribution, the companion of :func:`event_paths`:
    for every occurrence of a ``depth``-step event-type path, the NEXT
    event decides the outcome — converted if its type equals ``target``,
    abandoned otherwise (including end-of-stream). Returns the top-k
    paths by traversal count with their conversion counts and rates —
    which observed sequences actually LEAD to the goal, vs merely
    happen (funnels test one hypothesized sequence; this scores them
    all).

    Same single per-user window sort as :func:`event_paths` (the leads
    for the path AND the outcome ride one sort), then a hash count +
    TakeOrdered. NULL-typed events invalidate windows containing them
    (can't claim a path through an unknown step); a NULL *outcome* is a
    real observation — abandonment. ``conversion_rate`` is
    round-to-6 of n_converted / n_paths."""
    from databricks_demo_feature_store_spark.functions.rounding import dround

    if depth < 1:
        raise ValueError("path_conversion requires depth >= 1")
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, depth)
    ]
    outcome = F.lead(type_col, depth).over(w)
    complete = steps[0].isNotNull()
    for s in steps[1:]:
        complete = complete & s.isNotNull()
    occs = events.select(
        F.concat_ws(sep, *steps).alias("path"),
        (outcome == F.lit(target)).alias("__conv"),  # NULL outcome → NULL → not converted
        complete.alias("__complete"),
    ).filter(F.col("__complete"))
    counted = occs.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.sum(F.when(F.col("__conv"), 1).otherwise(0)).alias("n_converted"),
    )
    return (
        counted.select(
            "path",
            "n_paths",
            "n_converted",
            dround(
                F.col("n_converted").cast("double")
                / F.col("n_paths").cast("double"),
                6,
            ).alias("conversion_rate"),
        )
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(k)
    )
