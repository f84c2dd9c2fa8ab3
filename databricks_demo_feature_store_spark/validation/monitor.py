"""Cross-checking + freshness validators with persisted validation logs.

Parity targets in the reference (``src/packages/data_validation/``):

- CROSS_CHECKING — ``monitor.py:328-436``: per-month row counts of the
  source vs the target table, FULL OUTER joined on the month, ``na.fill(0)``,
  absolute difference and percentage columns, threshold flag.
- dimensional 5% drift — ``monitor.py:492-520``: a dimension table may
  drift at most ``threshold`` (default 5%) month-over-month.
- OUTDATENESS — ``outdateness.py:20-169``: max(date) in the table, plus
  the table's availability shift, compared against the reference month.
- ``register_validation`` — ``monitor.py:565-666``: summary/detail result
  rows appended to log tables with explicit StructType schemas
  (``ValidationSchemas`` — ``monitor.py:530-557``).

Scale notes: the per-month counts are map-side-combined hash aggregates on
a low-cardinality key (months), so the shuffle is tiny regardless of input
size; the outer join of two month-count tables is broadcast-sized by
construction.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from databricks_demo_feature_store_spark.functions.rounding import dround
from databricks_demo_feature_store_spark.sources.writers import save_table

SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("fecha_ejecucion", T.TimestampType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("validation", T.StringType(), False),
        T.StructField("layer", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("detail", T.StringType(), True),
    ]
)

DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("fecha_ejecucion", T.TimestampType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("validation", T.StringType(), False),
        T.StructField("month", T.DateType(), True),
        T.StructField("source_count", T.LongType(), True),
        T.StructField("target_count", T.LongType(), True),
        T.StructField("difference", T.LongType(), True),
        T.StructField("percentage", T.DoubleType(), True),
        T.StructField("passed", T.BooleanType(), False),
    ]
)


def monthly_counts(df: DataFrame, date_column: str, alias: str) -> DataFrame:
    """Per-month row counts — reference ``monitor.py:378-383``."""
    return df.groupBy(
        F.trunc(F.col(date_column).cast("date"), "month").alias("month")
    ).agg(F.count(F.lit(1)).alias(alias))


def cross_check(
    source: DataFrame,
    target: DataFrame,
    source_date_column: str,
    target_date_column: str,
    threshold_pct: float = 5.0,
) -> DataFrame:
    """Month-by-month count reconciliation (reference ``monitor.py:328-436``).

    Returns one row per month with ``source_count``, ``target_count``,
    ``difference``, ``percentage`` (|diff| / source * 100), and ``passed``
    (percentage ≤ threshold). Months absent on one side count as 0.
    """
    s = monthly_counts(source, source_date_column, "source_count")
    t = monthly_counts(target, target_date_column, "target_count")
    joined = s.join(t, on="month", how="outer").na.fill(
        0, subset=["source_count", "target_count"]
    )
    diff = F.col("source_count") - F.col("target_count")
    pct = F.when(
        F.col("source_count") > 0,
        dround(F.abs(diff) * 100.0 / F.col("source_count"), 4),
    ).otherwise(F.when(F.col("target_count") > 0, F.lit(100.0)).otherwise(F.lit(0.0)))
    return joined.select(
        "month",
        "source_count",
        "target_count",
        diff.alias("difference"),
        pct.alias("percentage"),
        (pct <= threshold_pct).alias("passed"),
    )


def dimension_drift(
    current: DataFrame, previous: DataFrame, threshold_pct: float = 5.0
) -> DataFrame:
    """Dimension-table total-count drift gate (reference ``monitor.py:492-520``)."""
    cur = current.agg(F.count(F.lit(1)).alias("current_count"))
    prev = previous.agg(F.count(F.lit(1)).alias("previous_count"))
    joined = cur.crossJoin(prev)
    pct = F.when(
        F.col("previous_count") > 0,
        dround(
            F.abs(F.col("current_count") - F.col("previous_count"))
            * 100.0
            / F.col("previous_count"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "current_count",
        "previous_count",
        pct.alias("drift_pct"),
        (pct <= threshold_pct).alias("passed"),
    )


@dataclass(frozen=True)
class OutdatenessResult:
    max_date: _dt.date | None
    expected_month: _dt.date
    available_month: _dt.date | None
    passed: bool


def freshness_frame(
    df: DataFrame,
    date_column: str,
    months_shift: int = 1,
    reference_month: _dt.date | None = None,
) -> DataFrame:
    """The freshness check as a one-row DataFrame (no driver round-trip):
    (max_month, available_month, reference_month, is_fresh) where
    ``available = max(month(date)) + months_shift`` and ``is_fresh =
    available >= reference``. This is the distributable core of
    :func:`outdateness`; pass an explicit ``reference_month`` for
    reproducible gating (the wall clock is not a deterministic input)."""
    ref = reference_month or _dt.date.today().replace(day=1)
    mx = F.max(F.trunc(F.col(date_column).cast("date"), "month"))
    return df.agg(mx.alias("max_month")).select(
        "max_month",
        F.add_months(F.col("max_month"), months_shift).alias("available_month"),
        F.lit(ref).cast("date").alias("reference_month"),
        F.coalesce(
            F.add_months(F.col("max_month"), months_shift) >= F.lit(ref).cast("date"),
            F.lit(False),
        ).alias("is_fresh"),
    )


def outdateness(
    df: DataFrame,
    date_column: str,
    months_shift: int = 1,
    reference_month: _dt.date | None = None,
) -> OutdatenessResult:
    """Freshness gate (reference ``outdateness.py:20-169``).

    ``max(date) + months_shift`` (the availability shift) must reach the
    reference month (defaults to the current month). The single-row
    collect of :func:`freshness_frame` is the only driver round-trip in
    the validation suite.
    """
    row = freshness_frame(df, date_column, months_shift, reference_month).collect()[0]
    return OutdatenessResult(
        row["max_month"], row["reference_month"], row["available_month"], row["is_fresh"]
    )


class ValidationLog:
    """Append validation outcomes to summary/detail log tables
    (reference ``register_validation`` — ``monitor.py:565-666``)."""

    def __init__(self, spark: SparkSession, summary_path: str, detail_path: str):
        self.spark = spark
        self.summary_path = summary_path
        self.detail_path = detail_path

    def record(
        self,
        table_name: str,
        validation: str,
        layer: str,
        passed: bool,
        detail: str | None = None,
        detail_rows: DataFrame | None = None,
        executed_at: _dt.datetime | None = None,
    ) -> None:
        ts = executed_at or _dt.datetime.now()
        summary = self.spark.createDataFrame(
            [(ts, table_name, validation, layer, bool(passed), detail)],
            schema=SUMMARY_SCHEMA,
        )
        save_table(summary, self.summary_path, mode="append")
        if detail_rows is not None:
            det = detail_rows.select(
                F.lit(ts).alias("fecha_ejecucion"),
                F.lit(table_name).alias("table_name"),
                F.lit(validation).alias("validation"),
                F.col("month"),
                F.col("source_count"),
                F.col("target_count"),
                F.col("difference"),
                F.col("percentage"),
                F.col("passed"),
            )
            save_table(det, self.detail_path, mode="append")

    def latest(self, table_name: str) -> DataFrame:
        """Latest validation record — reference ``monitor.py:47-49``."""
        df = self.spark.read.parquet(self.summary_path)
        return (
            df.filter(F.col("table_name") == table_name)
            .orderBy(F.desc("fecha_ejecucion"))
            .limit(1)
        )


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Column-level data profile: one output row per column with count,
    null rate, min/max, exact DECIMAL-routed mean, and interpolated
    p50/p95 quantiles.

    Net-new vs the reference's monitor (its checks are count-based,
    ``monitor.py:78-241``); this is the standard drift/quality baseline
    a feature platform records per snapshot. ONE aggregation job for all
    columns (a single partial+final agg, no per-column passes); the
    per-column rows are unpacked from the single agg row with
    explode — no extra shuffle. Quantiles use linear interpolation at
    (n-1)*q, which DuckDB's quantile_cont reproduces bit-exactly.
    """
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(col).alias(f"{c}__nn"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            (
                F.sum(col.cast("decimal(25,6)")).cast("double") / F.count(col)
            ).alias(f"{c}__mean"),
            F.expr(f"percentile(`{c.replace('`', '``')}`, 0.5)").alias(f"{c}__p50"),
            F.expr(f"percentile(`{c.replace('`', '``')}`, 0.95)").alias(f"{c}__p95"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_non_null"),
                dround((F.col(f"{c}__n") - F.col(f"{c}__nn")) / F.col(f"{c}__n"), 6).alias(
                    "null_rate"
                ),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                dround(F.col(f"{c}__mean"), 6).alias("mean_value"),
                dround(F.col(f"{c}__p50"), 6).alias("p50"),
                dround(F.col(f"{c}__p95"), 6).alias("p95"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
