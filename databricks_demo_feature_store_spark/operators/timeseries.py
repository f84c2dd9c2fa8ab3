"""Time-series downsampling: OHLC bar aggregation over an event stream.

The resample step every metrics/feature pipeline runs before modelling:
collapse raw ticks/events into fixed-interval bars carrying open / high /
low / close / volume statistics per entity. The reference's monthly
feature pipelines do the coarse version of this with ad-hoc first/last
window queries (see the keep-latest steps cited in
``operators/joins.py``); ``ohlc_bars`` is the general fixed-interval
form.

Scale shape: ONE hash aggregation. Bars are ``groupBy(entity,
window(ts))`` with ``min_by`` / ``max_by`` picking the open and close —
JVM aggregate expressions with map-side partial merge, so each executor
reduces its ticks to at most one partial bar per (entity, bucket) before
the single exchange. Never a window-function sort over the raw ticks and
never a per-bar self-join; 100 TB of ticks shuffle only as pre-combined
bar partials.

Determinism: open/close tie-break on ``(ts, tie_col)`` — a total order —
via struct-ordered ``min_by``/``max_by``; the volume sum routes through
DECIMAL so double summation order cannot flake the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ohlc_bars(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    bucket: str = "1 day",
    sum_scale: int = 6,
) -> DataFrame:
    """Downsample ticks to fixed-interval OHLC bars.

    Returns one row per ``(entity, bar_start)`` with columns
    ``bar_start`` (window start timestamp), ``open_value``,
    ``high_value``, ``low_value``, ``close_value``, ``n_ticks``,
    ``sum_value`` (DECIMAL-exact, surfaced as double) and ``mean_value``.

    ``tie_col`` must make ``(ts_col, tie_col)`` a total order per entity
    (an event id); open/close are then deterministic under concurrent
    equal timestamps, which plain ``first``/``last`` over a sorted window
    would not guarantee across retries.
    """
    key = F.struct(F.col(ts_col), F.col(tie_col))
    dec = F.col(value_col).cast(f"decimal(38,{sum_scale})")
    return (
        df.groupBy(
            F.col(entity_col),
            F.window(F.col(ts_col), bucket)["start"].alias("bar_start"),
        )
        .agg(
            F.min_by(F.col(value_col), key).alias("open_value"),
            F.max(F.col(value_col)).alias("high_value"),
            F.min(F.col(value_col)).alias("low_value"),
            F.max_by(F.col(value_col), key).alias("close_value"),
            F.count(F.col(value_col)).alias("n_ticks"),
            F.sum(dec).alias("__sum_dec"),
        )
        .select(
            entity_col,
            "bar_start",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "n_ticks",
            F.col("__sum_dec").cast("double").alias("sum_value"),
            (F.col("__sum_dec").cast("double") / F.col("n_ticks")).alias(
                "mean_value"
            ),
        )
    )


def merge_ohlc_bars(
    bars: DataFrame,
    entity_col: str,
    bucket: str = "7 days",
    bar_col: str = "bar_start",
    sum_scale: int = 6,
) -> DataFrame:
    """Re-aggregate finer bars into coarser ones WITHOUT the raw ticks —
    OHLC state is a merge monoid: open = open of the earliest sub-bar,
    close = close of the latest, high/low = max/min, counts and DECIMAL
    sums add. ``merged(daily → weekly) ≡ weekly-from-raw`` is the gated
    contract (q_ohlc_weekly_rollup) and the reason a 100 TB deployment
    keeps daily bars: any coarser grain derives from them at bar cost,
    never a tick rescan.

    ``bar_col`` values are unique per entity at the finer grain (window
    starts), so the min_by/max_by picks need no extra tie-break. The
    DECIMAL round-trip is exact: ``sum_value`` doubles are decimals of
    ≤15 significant digits, which survive double→decimal recast
    losslessly.
    """
    dec = F.col("sum_value").cast(f"decimal(38,{sum_scale})")
    return (
        bars.groupBy(
            F.col(entity_col),
            F.window(F.col(bar_col), bucket)["start"].alias("bar_start"),
        )
        .agg(
            F.min_by(F.col("open_value"), F.col(bar_col)).alias("open_value"),
            F.max(F.col("high_value")).alias("high_value"),
            F.min(F.col("low_value")).alias("low_value"),
            F.max_by(F.col("close_value"), F.col(bar_col)).alias("close_value"),
            F.sum(F.col("n_ticks")).alias("n_ticks"),
            F.sum(dec).alias("__sum_dec"),
        )
        .select(
            entity_col,
            "bar_start",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "n_ticks",
            F.col("__sum_dec").cast("double").alias("sum_value"),
            (F.col("__sum_dec").cast("double") / F.col("n_ticks")).alias(
                "mean_value"
            ),
        )
    )
