"""Time-series window operators: lags, diffs, rates of change, rolling
statistics, RSI, reverse sequence labels.

Parity targets in the reference:

- ``lag_column`` / ``generate_lags`` — ``fs_cus_credit_risk.py:121-133``,
  ``src/packages/preprocessing/transformers/lags.py:82-128``
- rolling stats — ``fs_cus_credit_risk.py:136-150,336-397,400-445``
- RSI — ``fs_cus_credit_risk.py:167-202``
- ``create_lags_ind`` — ``lags.py:12-51``
- lag/diff/roc — the *intended* semantics of the reference's dead code
  ``calculate_lags_and_features`` (``fs_cus_credit_risk.py:273-324``; it
  builds the expressions but returns the input unchanged — we implement
  them for real, and the reference's ``relative_change`` bug at
  ``lags.py:121-125`` — ``f.when()`` with no args — is fixed as
  ``(x - lag) / lag``).

All operators attach every new column in ONE ``select("*", *cols)`` so a
shared ``(partition_by, order_by)`` sort is planned as a single Window
exchange (the reference does the same at ``fs_cus_credit_risk.py:444``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def _base_window(partition_by: Sequence[str], order_by: Sequence[str]) -> Window:
    return Window.partitionBy(*partition_by).orderBy(*[F.col(c).asc() for c in order_by])


def generate_lags(
    df: DataFrame,
    columns: Sequence[str],
    lags: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    suffix: str = "m",
) -> DataFrame:
    """Add ``{col}_lag_{n}{suffix}`` columns (reference lags n ∈ {1,3,6})."""
    w = _base_window(partition_by, order_by)
    cols = [
        F.lag(c, n).over(w).alias(f"{c}_lag_{n}{suffix}")
        for c in columns
        for n in lags
    ]
    return df.select("*", *cols)


def lag_diff_roc(
    df: DataFrame,
    columns: Sequence[str],
    lags: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    suffix: str = "m",
    round_to: int = 4,
) -> DataFrame:
    """Lag + difference + rate-of-change features in one window pass.

    ``{c}_lag_{n}m`` = lag(c, n); ``{c}_diff_{n}m`` = c - lag;
    ``{c}_roc_{n}m`` = (c - lag) / lag, NULL when the lag is 0 or NULL.
    """
    w = _base_window(partition_by, order_by)
    cols: list[Column] = []
    for c in columns:
        for n in lags:
            lagged = F.lag(c, n).over(w)
            cols.append(lagged.alias(f"{c}_lag_{n}{suffix}"))
            cols.append((F.col(c) - lagged).alias(f"{c}_diff_{n}{suffix}"))
            cols.append(
                F.when(
                    lagged.isNotNull() & (lagged != 0),
                    dround((F.col(c) - lagged) / lagged, round_to),
                ).alias(f"{c}_roc_{n}{suffix}")
            )
    return df.select("*", *cols)


def rolling_numeric_stats(
    df: DataFrame,
    columns: Sequence[str],
    window_sizes: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    round_to: int = 4,
) -> DataFrame:
    """Rolling mean + sample stddev over the trailing N rows.

    Names ``{c}_ravg_{N}m`` / ``{c}_rstd_{N}m``, frame
    ``rowsBetween(-N+1, 0)`` — reference ``fs_cus_credit_risk.py:336-368``
    (frame at :150), ``lags.py:106-120``.
    """
    base = _base_window(partition_by, order_by)
    cols: list[Column] = []
    for n in window_sizes:
        frame = base.rowsBetween(-(n - 1), 0)
        for c in columns:
            cols.append(dround(F.avg(c).over(frame), round_to).alias(f"{c}_ravg_{n}m"))
            cols.append(dround(F.stddev_samp(c).over(frame), round_to).alias(f"{c}_rstd_{n}m"))
    return df.select("*", *cols)


def rolling_categorical_stats(
    df: DataFrame,
    columns: Sequence[str],
    window_sizes: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Rolling min + max — ``{c}_rmin_{N}m`` / ``{c}_rmax_{N}m``.

    Reference ``fs_cus_credit_risk.py:371-397``.
    """
    base = _base_window(partition_by, order_by)
    cols: list[Column] = []
    for n in window_sizes:
        frame = base.rowsBetween(-(n - 1), 0)
        for c in columns:
            cols.append(F.min(c).over(frame).alias(f"{c}_rmin_{n}m"))
            cols.append(F.max(c).over(frame).alias(f"{c}_rmax_{n}m"))
    return df.select("*", *cols)


def relative_strength_index(
    df: DataFrame,
    column: str,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    periods: int = 14,
    alias: str | None = None,
    round_to: int = 4,
) -> DataFrame:
    """RSI: 100 - 100 / (1 + avg_gain / avg_loss) over trailing ``periods`` rows.

    Reference ``fs_cus_credit_risk.py:167-202``: delta = x - lag(x, 1);
    gain = max(delta, 0); loss = max(-delta, 0); rolling simple averages
    over ``periods`` rows; NULL-safe division (loss avg of 0 → RSI 100 when
    gains exist, NULL when no movement at all).
    """
    alias = alias or f"{column}_rsi_{periods}"
    w = _base_window(partition_by, order_by)
    frame = w.rowsBetween(-(periods - 1), 0)

    delta = F.col(column) - F.lag(column, 1).over(w)
    # lit(0) (not 0.0) so a DECIMAL input column stays decimal — exact frame
    # sums make the rolling averages reproducible under any partitioning.
    gain = F.when(delta > 0, delta).otherwise(F.lit(0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0))

    with_deltas = df.select(
        "*", gain.alias("__gain"), loss.alias("__loss")
    )
    # avg as exact-sum / count: for decimal inputs the sum is exact, and the
    # single double division is IEEE-deterministic (plain F.avg over a double
    # frame would depend on accumulation order).
    cnt = F.count(F.lit(1)).over(frame)
    avg_gain = F.sum("__gain").over(frame).cast("double") / cnt
    avg_loss = F.sum("__loss").over(frame).cast("double") / cnt
    rsi = F.when(
        avg_loss == 0,
        F.when(avg_gain > 0, F.lit(100.0)).otherwise(F.lit(None)),
    ).otherwise(dround(100.0 - 100.0 / (1.0 + avg_gain / avg_loss), round_to))
    return with_deltas.select("*", rsi.alias(alias)).drop("__gain", "__loss")


def create_lags_ind(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    label_col: str = "lag_ind",
    descending_time: bool = True,
) -> DataFrame:
    """Reverse sequence label ``lag_{k}`` per row (k=0 is the latest row).

    Reference ``lags.py:12-51``: ``row_number()`` over (pk, order) +
    ``max(seq)`` over pk → ``lag_{max-seq}`` label. We compute the reverse
    row number directly with a descending order, avoiding the second
    window + join of the reference.
    """
    order_cols = [
        F.col(c).desc() if descending_time else F.col(c).asc() for c in order_by
    ]
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    return df.select(
        "*",
        F.concat(F.lit("lag_"), (F.row_number().over(w) - 1).cast("string")).alias(
            label_col
        ),
    )


def rolling_quantiles(
    df: DataFrame,
    columns: Sequence[str],
    quantiles: Sequence[float],
    window_sizes: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    round_to: int = 4,
) -> DataFrame:
    """Rolling EXACT quantiles over the trailing N rows —
    ``{c}_rq{QQ}_{N}m`` (e.g. ``spend_rq50_3m`` = trailing 3-month
    median): the robust-statistics companion to the rolling mean/std
    (medians shrug off the one-off spike that drags an average).

    Exact ``percentile`` (linear interpolation), not the approximate
    sketch: window frames are small (a handful of rows), so exactness is
    free, deterministic, and cross-engine checkable (DuckDB
    ``quantile_cont`` computes the identical value — the same mapping
    the column profiler's gate already proves). All quantile columns
    share the one (partition, order) sort every other rolling stat uses.
    """
    base = _base_window(partition_by, order_by)
    cols: list[Column] = []
    for n in window_sizes:
        frame = base.rowsBetween(-(n - 1), 0)
        for c in columns:
            for q in quantiles:
                cols.append(
                    dround(
                        F.expr(f"percentile(`{c}`, {q!r})").over(frame), round_to
                    ).alias(f"{c}_rq{int(q * 100):02d}_{n}m")
                )
    return df.select("*", *cols)


def rolling_ewma(
    df: DataFrame,
    columns: Sequence[str],
    alpha: float,
    window_sizes: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    round_to: int = 4,
) -> DataFrame:
    """Exponentially weighted moving average over the trailing N rows —
    ``{c}_ewma{N}m``: recent months dominate, old months decay by
    ``(1-α)`` per step (the adjusted form,
    ``Σ (1-α)^(m-i)·x_i / Σ (1-α)^(m-i)`` over the frame, i.e.
    pandas ``ewm(alpha, adjust=True).mean()`` restricted to the window).

    A TRUE infinite-history EWM is a per-key recursion Spark's window
    algebra can't express declaratively; the bounded-frame form keeps
    ≥ ``1-(1-α)^N`` of the total weight mass (α=0.5, N=6 → 98.4%), is
    shuffle-free beyond the shared sort, and — unlike the recursion —
    is exactly reproducible by any engine with list algebra, so it
    gate-checks. Fold order equals frame order on both engines, so the
    doubles match bit-for-bit before rounding.

    NULL rows keep their frame slot: values are collected as structs (a
    bare ``collect_list`` would compact NULLs out, silently re-assigning
    decay weights by position among the survivors), so a NULL at offset
    ``i`` contributes nothing to numerator or weight mass while the
    neighbors keep their true row-offset decay — pandas
    ``ewm(adjust=True).mean()`` NaN semantics. All-NULL frame → NULL.
    """
    base = _base_window(partition_by, order_by)
    decay = 1.0 - alpha
    cols: list[Column] = []
    for n in window_sizes:
        frame = base.rowsBetween(-(n - 1), 0)
        for c in columns:
            # struct-wrap: one list slot per frame ROW, null-valued or not
            xs = F.collect_list(
                F.struct(F.col(c).cast("double").alias("x"))
            ).over(frame)
            m = F.size(xs)
            weighted = F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), m),
                    lambda i: F.coalesce(
                        F.pow(F.lit(decay), (m - i).cast("double"))
                        * F.element_at(xs, i)["x"],
                        F.lit(0.0),
                    ),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            wsum = F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), m),
                    lambda i: F.when(
                        F.element_at(xs, i)["x"].isNotNull(),
                        F.pow(F.lit(decay), (m - i).cast("double")),
                    ).otherwise(F.lit(0.0)),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            cols.append(
                dround(
                    F.when(wsum > 0, weighted / wsum), round_to
                ).alias(f"{c}_ewma{n}m")
            )
    return df.select("*", *cols)


def fill_monthly_gaps(
    df: DataFrame,
    entity_col: str,
    month_col: str,
    value_cols: Sequence[str],
    interpolate: bool = True,
    round_to: int = 6,
    stable_quantize: bool = False,
) -> DataFrame:
    """Densify a sparse per-entity monthly series: emit EVERY month
    between each entity's first and last observation, then (optionally)
    linearly interpolate interior gaps — the resample+interpolate step a
    monthly feature pipeline needs before lag/rolling features, which
    otherwise silently treat a 3-month gap as one step.

    Output: the spine with the original ``{col}`` (NULL on gap months)
    and ``{col}_filled`` (linear interpolation between the nearest
    observed neighbors; months before the first / after the last
    observation stay NULL — no extrapolation).

    Scale shape: the spine is one hash agg (min/max month per entity) +
    a ``sequence`` explode (fan-out bounded by the series length, no
    cross join). Both neighbor scans are RUNNING ``last IGNORE NULLS``
    frames — ascending for the previous neighbor, descending for the
    next — because Spark evaluates an UnboundedPreceding frame in O(n)
    per partition while an UnboundedFollowing one is recomputed per row,
    O(n²) (measured 4s → 1s at sf0.1 on 30-80-row partitions). Same
    hash partitioning on the entity → ONE exchange; the descending pass
    adds an in-partition re-sort only.

    ``stable_quantize=True`` switches the final rounding of the
    interpolated value from ``dround`` (double→DECIMAL HALF_UP cast —
    engine-dependent exactly ON 10^-round_to boundaries) to
    ``floor_quantize`` = floor(x·10^round_to + 0.5) in pure IEEE
    doubles, bit-identical across engines. Use it when the value
    columns are exact decimal quantities (money sums etc.):
    interpolations of such values land ON rounding boundaries whenever
    the month gap divides the blend numerator, which is where Spark
    (shortest-repr) and DuckDB (binary) round apart (measured
    last-digit flips at sf0.1, round 12). The blend itself is the same
    pure-double ``prev + (nxt−prev)·frac`` either way — only the
    quantizer differs.
    """
    ent, mon = F.col(entity_col), F.col(month_col)
    spine = (
        df.groupBy(entity_col)
        .agg(F.min(mon).alias("__m0"), F.max(mon).alias("__m1"))
        .select(
            entity_col,
            F.explode(
                F.expr("sequence(__m0, __m1, interval 1 month)")
            ).alias(month_col),
        )
    )
    dense = spine.join(df, on=[entity_col, month_col], how="left")
    if not interpolate:
        return dense

    back = (
        Window.partitionBy(entity_col)
        .orderBy(F.col(month_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(entity_col)
        .orderBy(F.col(month_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if stable_quantize:
        # The linear blend is pure IEEE double arithmetic (bit-identical
        # across engines on identical inputs); only the final quantization
        # is engine-sensitive — floor_quantize, never a double→DECIMAL
        # cast (engine-dependent at the 10^-round_to boundaries the blend
        # hits whenever gap | numerator; measured at sf0.1, r12).
        from databricks_demo_feature_store_spark.functions.rounding import (
            floor_quantize as _quantize,
        )
    else:
        _quantize = dround
    out = dense
    for c in value_cols:
        x = F.col(c).cast("double")
        prev = F.last(x, ignorenulls=True).over(back)
        prev_m = F.last(F.when(x.isNotNull(), F.col(month_col)), True).over(back)
        nxt = F.last(x, ignorenulls=True).over(fwd)
        nxt_m = F.last(F.when(x.isNotNull(), F.col(month_col)), True).over(fwd)
        frac = F.months_between(F.col(month_col), prev_m) / F.months_between(
            nxt_m, prev_m
        )
        filled = F.when(x.isNotNull(), x).otherwise(
            F.when(
                prev.isNotNull() & nxt.isNotNull(),
                prev + (nxt - prev) * frac,
            )
        )
        out = out.withColumn(f"{c}_filled", _quantize(filled, round_to))
    return out


def rank_normalize(
    df: DataFrame,
    columns: Sequence[str],
    partition_by: Sequence[str],
    suffix: str = "_pctrank",
    round_to: int = 6,
) -> DataFrame:
    """Group-wise rank normalization: each value becomes its
    ``percent_rank`` within its partition (0 = group minimum, 1 = group
    maximum) — the monotone-invariant scaling that neutralizes skew and
    outliers where z-scores cannot (ranks don't care HOW far the tail
    stretches). Appends ``{col}{suffix}``; NULLs pass through with NULL
    rank (ordering them would hand "missing" the extreme ranks).

    One PARTITIONED window per column set, sharing the per-entity sort —
    state scales with the partition key's group sizes, never a global
    sort. For an UNGROUPED global rank-normalize, use
    ``attach_global_rank`` and divide by the total instead (a
    partition-less percent_rank would move the world to one task).
    """
    out_cols: list[Column] = []
    part = [F.col(p) for p in partition_by]
    for c in columns:
        w = Window.partitionBy(*part).orderBy(F.col(c).asc())
        wp = Window.partitionBy(*part)
        # NULLs sort first, so a raw percent_rank would both hand them
        # rank 0 AND inflate every real value's denominator; subtract
        # the group's null block and rank over non-null counts only
        n_nulls = F.count(F.lit(1)).over(wp) - F.count(F.col(c)).over(wp)
        n_vals = F.count(F.col(c)).over(wp)
        rank_nn = F.rank().over(w) - n_nulls - F.lit(1)
        pr = F.when(
            F.col(c).isNotNull(),
            F.when(
                n_vals > 1,
                rank_nn.cast("double") / (n_vals - F.lit(1)).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        out_cols.append(dround(pr, round_to).alias(f"{c}{suffix}"))
    return df.select("*", *out_cols)


def _anchor_window_features(
    df_spine: DataFrame,
    df_events: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    event_time: str,
    lo_offset_exprs: Sequence[str | None],
    hi_offset_expr: str | None,
    anchor_tag: int,
    sum_cols: Sequence[tuple[str, str]],
    count_col: str | None,
    scale: int,
    window_suffixes: Sequence[str] | None = None,
) -> DataFrame:
    """Shared prefix-sum + anchor-carry core for
    :func:`trailing_window_features` (anchors at ``t-w`` / ``t``,
    ``anchor_tag=0`` → anchors sort BEFORE events at equal time, both
    bounds exclusive-of-anchor-instant) and
    :func:`label_window_features` (anchors at ``t`` / ``t+h``,
    ``anchor_tag=2`` → anchors sort AFTER events, both bounds
    inclusive-of-anchor-instant). Events always carry sort tag 1; each
    window is ``cum(hi anchor) − cum(that window's lo anchor)``.
    ``lo_offset_exprs`` is one interval string per requested window
    (None = the spine time itself) — N windows share the ONE shuffle
    and sort, each adding only one more anchor row per spine row.
    ``window_suffixes`` names multi-window outputs (``{out}_{suffix}``);
    None = single window, unsuffixed. Measure sources are parsed with
    ``F.expr`` — a conditional measure ("CASE WHEN type='buy' THEN
    value END") sums only its matching events (NULL terms drop out of
    both the sum and, via its own non-null count, nothing here — the
    event COUNT column counts every event row in range)."""
    keys = list(keys)
    sum_cols = list(sum_cols)
    lo_offset_exprs = list(lo_offset_exprs)
    spine_cols = [c for c in df_spine.columns if c not in keys]

    out_names = []
    for j in range(len(lo_offset_exprs)):
        sfx = None if window_suffixes is None else window_suffixes[j]
        out_names.extend(
            out if sfx is None else f"{out}_{sfx}" for out, _src in sum_cols
        )
        if count_col is not None:
            out_names.append(count_col if sfx is None else f"{count_col}_{sfx}")
    dup = (set(out_names) & set(df_spine.columns)) | {
        n for n in out_names if out_names.count(n) > 1
    }
    if dup:
        raise ValueError(
            f"window features: output columns {sorted(dup)} collide with the "
            "spine's columns (or each other) — rename before computing"
        )

    ev = df_events.select(
        *keys,
        F.col(event_time).cast("timestamp").alias("__t"),
        *[
            F.expr(src).cast(f"decimal(25,{scale})").alias(f"__m{i}")
            for i, (_out, src) in enumerate(sum_cols)
        ],
        F.lit(1).cast("long").alias("__c"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # RANGE frame, not ROWS: every row of an equal-time run carries the
    # run's FULL total (peers share one frame), so the later carry
    # window's F.last is tie-deterministic — a ROWS frame would hand
    # tied rows order-dependent partial sums, and the carry sort's
    # intra-tie order is not guaranteed to match this one's
    cum = ev.select(
        *keys,
        "__t",
        F.lit(1).alias("__is_event"),
        *[
            F.sum(f"__m{i}").over(w_cum).alias(f"__cum{i}")
            for i in range(len(sum_cols))
        ],
        F.sum("__c").over(w_cum).alias("__cumc"),
    )

    spine = df_spine.select(
        F.monotonically_increasing_id().alias("__uid"), "*"
    )
    payload_struct = F.struct(*[F.col(c) for c in ([*keys, *spine_cols])])
    ts = F.col(spine_time).cast("timestamp")
    hi_t = ts + F.expr(hi_offset_expr) if hi_offset_expr is not None else ts
    lo_structs = [
        F.struct(
            (ts + F.expr(off) if off is not None else ts).alias("__t"),
            F.lit(j).alias("__w"),
        )
        for j, off in enumerate(lo_offset_exprs)
    ]
    # the HI anchor (__w = -1) carries the spine payload through the
    # pipeline so the collapse needs no join back to the spine (one fewer
    # exchange); each window adds ONE more lo anchor row, nothing else
    anchors = spine.select(
        "__uid",
        *keys,
        payload_struct.alias("__p"),
        F.explode(
            F.array(
                F.struct(hi_t.alias("__t"), F.lit(-1).alias("__w")),
                *lo_structs,
            )
        ).alias("__a"),
    ).select(
        "__uid",
        *keys,
        F.col("__a.__t").alias("__t"),
        F.col("__a.__w").alias("__w"),
        F.lit(anchor_tag).alias("__is_event"),
        F.when(F.col("__a.__w") == -1, F.col("__p")).alias("__p"),
    )

    cum_cols = [f"__cum{i}" for i in range(len(sum_cols))] + ["__cumc"]
    anchors_shaped = anchors.select(
        *keys,
        "__t",
        "__is_event",
        *[F.lit(None).cast(cum.schema[c].dataType).alias(c) for c in cum_cols],
        "__uid",
        "__w",
        "__p",
    )
    cum_shaped = cum.select(
        *keys, "__t", "__is_event", *cum_cols,
        F.lit(None).cast("long").alias("__uid"),
        F.lit(None).cast("int").alias("__w"),
        F.lit(None).cast(anchors.schema["__p"].dataType).alias("__p"),
    )
    unioned = cum_shaped.unionByName(anchors_shaped)

    # anchor_tag=0: anchors sort BEFORE events at equal time — carried
    # prefix is STRICTLY-before (trailing's half-open [t-w, t)).
    # anchor_tag=2: anchors sort AFTER events — carried prefix is
    # inclusive (label's half-open (t, t+h]). One ordering rule each.
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_event").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__uid",
        "__w",
        "__p",
        F.col("__is_event"),
        *[
            F.last(c, ignorenulls=True).over(w_carry).alias(c) for c in cum_cols
        ],
    ).filter(F.col("__is_event") == F.lit(anchor_tag))

    def _suffix(name: str, j: int) -> str:
        return name if window_suffixes is None else f"{name}_{window_suffixes[j]}"

    zero = F.lit(0).cast(f"decimal(25,{scale})")
    window_ids = range(len(lo_offset_exprs))
    feature_aggs = []
    for j in window_ids:
        for i, (out, _src) in enumerate(sum_cols):
            feature_aggs.append(
                (
                    F.max(F.when(F.col("__w") == -1, F.coalesce(F.col(f"__cum{i}"), zero)))
                    - F.max(F.when(F.col("__w") == j, F.coalesce(F.col(f"__cum{i}"), zero)))
                ).cast("double").alias(_suffix(out, j))
            )
        if count_col is not None:
            feature_aggs.append(
                (
                    F.max(F.when(F.col("__w") == -1, F.coalesce(F.col("__cumc"), F.lit(0))))
                    - F.max(F.when(F.col("__w") == j, F.coalesce(F.col("__cumc"), F.lit(0))))
                ).alias(_suffix(count_col, j))
            )
    hi_lo = carried.groupBy("__uid").agg(
        # exactly one non-null __p per group (the hi anchor) — first() is
        # deterministic here and, unlike max(), needs no orderable struct
        F.first("__p", ignorenulls=True).alias("__p"),
        *feature_aggs,
    )
    result_cols = [
        *[F.col("__p").getField(c).alias(c) for c in [*keys, *spine_cols]],
        *[
            F.col(_suffix(out, j))
            for j in window_ids
            for out, _src in sum_cols
        ],
        *(
            [F.col(_suffix(count_col, j)) for j in window_ids]
            if count_col is not None
            else []
        ),
    ]
    return hi_lo.select(*result_cols)


def trailing_window_features(
    df_spine: DataFrame,
    df_events: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    event_time: str,
    window_expr: str,
    sum_cols: Sequence[tuple[str, str]] = (),
    count_col: str | None = None,
    scale: int = 2,
) -> DataFrame:
    """Trailing-window aggregate features anchored at ARBITRARY spine
    timestamps: for every spine row, the sum/count of events in
    ``[spine_time - window, spine_time)`` per key — the time-window
    aggregation features (trailing 90-day spend, 7-day event count, …)
    a feature store computes next to its as-of lookups. The window is
    half-open: an event AT the spine instant is excluded (it is not
    known strictly before the label — the leakage-safe convention).

    ``sum_cols``: (output_name, event_column) pairs, each an exact
    DECIMAL(25, ``scale``) sum returned as DOUBLE; ``count_col``
    optionally names a trailing event count. Spine rows with no events
    in range get 0.0 / 0 (not NULL — an empty window is a real
    observation).

    Scale shape — the naive form (theta join ``key equal AND t-w <= te
    < t`` then aggregate) multiplies every spine row by its trailing
    events: quadratic per hot key, dead at 100 TB. Here the window
    aggregate becomes a PREFIX-SUM DIFFERENCE: events get an exact
    per-key running DECIMAL cumsum (one hash shuffle + one sort); each
    spine row contributes two ANCHOR rows (at ``t`` and ``t - window``)
    into the same union, each anchor carrying the latest cumsum
    STRICTLY BEFORE its instant (anchors sort before events at equal
    time — that is the half-open boundary); the two carries collapse
    back to one row per spine row with a map-combinable aggregation and
    the feature is ``cum(t) - cum(t-w)``. Linear in events + spine,
    independent of window length and per-key density. DECIMAL cumsums
    make the subtraction exact (no float cancellation), so results are
    bit-identical across partitionings and engines.

    The collapse uses an internal spine row id (assigned BEFORE the
    anchors are exploded) purely as a grouping handle — duplicate spine
    rows keep their multiplicity; the id never reaches the output.
    """
    return _anchor_window_features(
        df_spine,
        df_events,
        keys,
        spine_time,
        event_time,
        lo_offset_exprs=[f"- ({window_expr})"],
        hi_offset_expr=None,
        anchor_tag=0,
        sum_cols=sum_cols,
        count_col=count_col,
        scale=scale,
    )


def trailing_multi_window_features(
    df_spine: DataFrame,
    df_events: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    event_time: str,
    windows: Sequence[tuple[str, str]],
    sum_cols: Sequence[tuple[str, str]] = (),
    count_col: str | None = None,
    scale: int = 2,
) -> DataFrame:
    """N trailing windows for the price of ONE — the shape a real
    feature store computes (7-day / 30-day / 90-day spend and counts per
    entity, all at the same label instants). ``windows`` is a list of
    ``(suffix, interval)`` pairs; every output column is
    ``{name}_{suffix}``.

    Cost model vs N calls to :func:`trailing_window_features`: the
    events are cumsum-sorted ONCE and the union shuffles ONCE; each
    extra window adds a single anchor row per spine row (≈ spine-sized)
    — not another pass over the events. At 100 TB with 3 windows that
    is 3× less event shuffle I/O than the per-window form, and the
    exactness contract (DECIMAL prefix sums, half-open [t-w, t)
    boundaries) is identical. ``sum_cols`` sources are SQL expressions,
    so conditional measures ("CASE WHEN event_type='purchase' THEN
    value END") compute per-type sums in the same pass.
    """
    windows = list(windows)
    if not windows:
        raise ValueError("trailing_multi_window_features requires >= 1 window")
    return _anchor_window_features(
        df_spine,
        df_events,
        keys,
        spine_time,
        event_time,
        lo_offset_exprs=[f"- ({interval})" for _sfx, interval in windows],
        hi_offset_expr=None,
        anchor_tag=0,
        sum_cols=sum_cols,
        count_col=count_col,
        scale=scale,
        window_suffixes=[sfx for sfx, _interval in windows],
    )


def label_window_features(
    df_spine: DataFrame,
    df_events: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    event_time: str,
    horizon_expr: str,
    sum_cols: Sequence[tuple[str, str]] = (),
    count_col: str | None = None,
    scale: int = 2,
) -> DataFrame:
    """FORWARD outcome-window aggregates for label generation: per spine
    row, the sum/count of events in ``(spine_time, spine_time + horizon]``
    per key — "did the customer churn / how much did they spend in the
    next 90 days", the label side of every forward-horizon training set.
    The window opens STRICTLY AFTER the spine instant (an event at the
    decision time is a feature, not an outcome) and closes inclusively
    at the horizon.

    The mirror of :func:`trailing_window_features` on the same
    prefix-sum + anchor-carry core (anchors at ``t`` and ``t+h`` with
    INCLUSIVE carries — events sort before anchors at equal time), so
    it shares its scale shape: one shuffle, linear in events, exact
    DECIMAL arithmetic. Pair with ``validation/integrity.py``'s
    purged/embargoed folds: labels built here need exactly that split
    discipline.
    """
    return _anchor_window_features(
        df_spine,
        df_events,
        keys,
        spine_time,
        event_time,
        lo_offset_exprs=[None],
        hi_offset_expr=f"+ ({horizon_expr})",
        anchor_tag=2,
        sum_cols=sum_cols,
        count_col=count_col,
        scale=scale,
    )


def seasonal_decompose(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
    period: int = 12,
    scale: int = 4,
) -> DataFrame:
    """Classical additive seasonal decomposition of a REGULAR per-key
    series (one row per key per period — densify with
    ``fill_gaps_interpolate`` first): ``value = trend + seasonal +
    residual``, the de-seasonalization step behind "spend vs its
    seasonal norm" features.

    - ``trend``: the standard 2×m centered moving average for an even
      ``period`` m — ``(Σ_{t−m/2..t+m/2} x − ½(x_{t−m/2}+x_{t+m/2}))/m``
      — NULL at the series edges (no partial-window extrapolation).
    - ``seasonal``: per-(key, cycle position) mean of the detrended
      series, centered per key so one full cycle sums to ≈ 0.
    - ``residual``: ``value − trend − seasonal`` (NULL where trend is).

    Every stage runs in INTEGER units of 10^-scale with explicit
    HALF_UP integer division — no floating-point rounding anywhere.
    This is not pedantry: the MA divides an exact sum by 2m, and such
    ratios land EXACTLY on decimal rounding boundaries with probability
    ~1/2m per row (a sum ≡ m mod 2m), where double-based rounding is
    engine-dependent (Spark rounds the shortest decimal repr, DuckDB
    the binary value — measured dozens of last-digit flips at any
    dround scale). Integer arithmetic is identical everywhere, so the
    decomposition is bit-reproducible across engines and partitionings.
    Value magnitudes must fit ``|value|·10^scale`` in a long — 9e14 at
    the default scale 4; window sums of units are exact longs.

    Scale shape: one window exchange on (keys) carries the centered MA
    and both endpoint lags; the seasonal means are two small hash aggs
    over (keys, position). Cycle position derives from the row's rank
    within its key (mod period), so the series may start at any
    calendar offset.
    """
    keys = list(keys)
    half = period // 2
    if period % 2 != 0:
        raise ValueError("seasonal_decompose: even period required (2xm MA form)")
    unit = 10 ** scale

    def half_up(num, den_col):
        # sign-aware HALF_UP integer division: sign(n)·((2|n| + d) div 2d).
        # The quotient runs through DECIMAL, not double ("/" on longs is
        # double division — silent precision loss past 2^53): Spark's
        # decimal division rounds at scale ≥ 6, and the true quotient is
        # ≥ 1/(2d) ≈ 0.038 away from any integer it doesn't hit exactly,
        # so the floor is provably exact.
        q = (F.lit(2) * F.abs(num) + den_col).cast("decimal(38,0)") / (
            F.lit(2) * den_col
        ).cast("decimal(38,0)")
        return F.signum(num).cast("long") * F.floor(q).cast("long")

    w_ord = Window.partitionBy(*keys).orderBy(time_col)
    w_ma = w_ord.rowsBetween(-half, half)
    w_key = Window.partitionBy(*keys)
    vu = (
        (F.col(value_col).cast(f"decimal(38,{scale})") * F.lit(unit))
        .cast("long")
        .alias("__vu")
    )
    staged = df.select(*keys, time_col, value_col, vu).select(
        "*",
        ((F.row_number().over(w_ord) - 1) % period).alias("__pos"),
        (
            F.lit(2) * F.sum("__vu").over(w_ma)
            - F.lag("__vu", half).over(w_ord)
            - F.lead("__vu", half).over(w_ord)
        ).alias("__t_num"),
    )
    staged = staged.withColumn(
        "__tu", half_up(F.col("__t_num"), F.lit(2 * period))
    ).withColumn("__du", F.col("__vu") - F.col("__tu"))
    seas_raw = staged.groupBy(*keys, "__pos").agg(
        half_up(F.sum("__du"), F.count("__du")).alias("__su")
    )
    seas = seas_raw.withColumn(
        "__mu", half_up(F.sum("__su").over(w_key), F.count("__su").over(w_key))
    ).select(*keys, "__pos", (F.col("__su") - F.col("__mu")).alias("__eu"))
    to_d = lambda c: (c.cast("double") / F.lit(float(unit)))
    return staged.join(seas, on=[*keys, "__pos"]).select(
        *keys,
        time_col,
        value_col,
        to_d(F.col("__tu")).alias("trend"),
        to_d(F.col("__eu")).alias("seasonal"),
        to_d(F.col("__vu") - F.col("__tu") - F.col("__eu")).alias("residual"),
    )


def seasonal_anomalies(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
    period: int = 12,
    scale: int = 4,
    k: float = 3.0,
) -> DataFrame:
    """Robust seasonal anomaly detection: decompose, then flag rows whose
    residual deviates more than ``k`` robust sigmas from the per-key
    residual median (σ ≈ 1.4826·MAD) — "this month's spend is abnormal
    AFTER accounting for trend and seasonality", the alerting rule plain
    z-scores on the raw series get wrong twice (trend inflates the mean,
    seasonality inflates the sigma).

    Determinism: the decomposition is integer-unit exact
    (:func:`seasonal_decompose`); median and MAD are EXACT percentiles
    of integers (midpoint interpolation yields .0/.5 doubles
    identically everywhere), so the flag comparison sees bit-identical
    operands on every engine — even exactly ON the threshold.

    One extra per-key aggregate pair over the decomposed frame; edge
    rows (NULL trend) carry NULL flags rather than polluting the MAD.
    """
    keys = list(keys)
    unit = 10 ** scale
    dec = seasonal_decompose(
        df, keys=keys, time_col=time_col, value_col=value_col,
        period=period, scale=scale,
    )
    # round before the long cast: residual·unit is integral by
    # construction but arrives as resid_u/unit·unit — a double that can
    # sit an ulp below the integer, which cast(long) would TRUNCATE
    ru = F.round(F.col("residual") * F.lit(unit), 0).cast("long")
    # med and MAD are whole-partition aggregates over the SAME key
    # partitioning the decomposition already established — compute them
    # as window functions, not groupBy+join-back: the join form fanned
    # the entire decompose subtree out to three plan consumers (3×
    # SortMergeJoin, 3 re-executions of the decompose windows — measured
    # in plans/r14/q_seasonal_anomalies_before.txt: 14 SMJ / 47
    # Exchange, zero ReusedExchange). percentile ignores NULLs in both
    # the aggregate and the window form, and every key has ≥1 row, so
    # the inner joins dropped nothing — value-identical by construction
    # for non-NULL keys. Contract note (ADVICE r14): rows whose KEY
    # columns are NULL were dropped by the old inner joins but are kept
    # here (Window.partitionBy groups NULL keys into one partition); the
    # engine's callers all pass non-null keys (TPC-H dimension keys), so
    # results are unchanged where it is used.
    w_key = Window.partitionBy(*keys)
    out = (
        dec.withColumn("__ru", ru)
        .withColumn("__med", F.expr("percentile(__ru, 0.5)").over(w_key))
        .withColumn("__ad", F.abs(F.col("__ru") - F.col("__med")))
        .withColumn("__mad", F.expr("percentile(__ad, 0.5)").over(w_key))
    )
    thresh = F.lit(float(k)) * F.lit(1.4826) * F.col("__mad")
    return out.select(
        *keys,
        time_col,
        value_col,
        "trend",
        "seasonal",
        "residual",
        F.when(
            F.col("__ru").isNotNull(),
            F.abs(F.col("__ru") - F.col("__med")) > thresh,
        ).alias("is_anomaly"),
    )
