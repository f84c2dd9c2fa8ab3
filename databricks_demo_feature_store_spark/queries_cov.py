"""Coverage queries for the remaining SURVEY §2 operator families: RSI,
reverse lag labels, native pivot, generic window dispatch, top-1-by-time,
month-spine cross join, feature-generation scalar chain, and the layered
sink→scan roundtrip.

Every query is oracle-backed; determinism follows the repo contract
(double sums through DECIMAL, divisions in IEEE double, dround for
rounded outputs — see ``queries.py`` module docstring).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_demo_feature_store_spark.functions import (
    choose_columns_as_value,
    concat_columns,
    impute_dataframe,
    math_operations,
    standardize_na_values,
)
from databricks_demo_feature_store_spark.functions.feature_generation import (
    spark_function_operations,
)
from databricks_demo_feature_store_spark.operators import (
    aggregation_operations,
    create_lags_ind,
    relative_strength_index,
    window_operations,
)
from databricks_demo_feature_store_spark.queries import (
    _dsum,
    _o_dsum,
    load,
    register,
)
from databricks_demo_feature_store_spark.functions.rounding import oracle_dround
from databricks_demo_feature_store_spark.sources.catalog import Catalog
from databricks_demo_feature_store_spark.sources.writers import save_table

# Exact monthly spend kept in DECIMAL (not cast to double) so downstream
# window arithmetic (RSI deltas, frame sums) is exact in both engines.
_O_MONTHLY_DEC = """
    monthly AS (
      SELECT o_custkey AS custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS total_spend
      FROM orders
      GROUP BY 1, 2
    )
"""


def _monthly_orders_dec(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("order_month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(25,2)")).alias("total_spend"))


# ---------------------------------------------------------------------------
# RSI — composite lag + conditional split + rolling average
# ---------------------------------------------------------------------------


@register(
    "q_rsi",
    oracle=f"""
    WITH {_O_MONTHLY_DEC},
    d AS (
      SELECT custkey, order_month, total_spend,
             total_spend - LAG(total_spend, 1) OVER w AS delta
      FROM monthly
      WINDOW w AS (PARTITION BY custkey ORDER BY order_month ASC)
    ),
    g AS (
      SELECT custkey, order_month, total_spend,
             CASE WHEN delta > 0 THEN delta ELSE 0 END AS gain,
             CASE WHEN delta < 0 THEN -delta ELSE 0 END AS loss
      FROM d
    ),
    a AS (
      SELECT custkey, order_month, total_spend,
             CAST(SUM(gain) OVER f AS DOUBLE) / COUNT(*) OVER f AS ag,
             CAST(SUM(loss) OVER f AS DOUBLE) / COUNT(*) OVER f AS al
      FROM g
      WINDOW f AS (PARTITION BY custkey ORDER BY order_month ASC
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT custkey, order_month,
           CAST(total_spend AS DOUBLE) AS total_spend,
           CASE WHEN al = 0 THEN (CASE WHEN ag > 0 THEN 100.0 END)
                ELSE {oracle_dround('100.0 - 100.0 / (1.0 + ag / al)')}
           END AS total_spend_rsi_6
    FROM a
    """,
)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index over the monthly spend series — the
    reference's composite indicator (fs_cus_credit_risk.py:167-202),
    6-period variant for a monthly grain."""
    m = _monthly_orders_dec(spark, sf_dir)
    out = relative_strength_index(
        m, "total_spend", partition_by=["custkey"], order_by=["order_month"], periods=6
    )
    return out.select(
        "custkey",
        "order_month",
        F.col("total_spend").cast("double").alias("total_spend"),
        "total_spend_rsi_6",
    )


# ---------------------------------------------------------------------------
# Reverse sequence labels
# ---------------------------------------------------------------------------


@register(
    "q_lags_ind",
    oracle=f"""
    WITH {_O_MONTHLY_DEC}
    SELECT custkey, order_month,
           concat('lag_', CAST(ROW_NUMBER() OVER (
             PARTITION BY custkey ORDER BY order_month DESC) - 1 AS VARCHAR)) AS lag_ind
    FROM monthly
    """,
)
def q_lags_ind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_lags_ind reverse sequence label (reference lags.py:12-51) —
    lag_0 is each customer's latest month."""
    m = _monthly_orders_dec(spark, sf_dir)
    return create_lags_ind(
        m, partition_by=["custkey"], order_by=["order_month"]
    ).select("custkey", "order_month", "lag_ind")


# ---------------------------------------------------------------------------
# Native pivot (GroupedData.pivot with explicit values)
# ---------------------------------------------------------------------------


@register(
    "q_native_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(25,2)) END) AS DOUBLE) AS F_sum_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F_cnt,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(25,2)) END) AS DOUBLE) AS O_sum_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O_cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupedData.pivot with explicit pivot values (reference
    aggregation.py:142) — explicit values skip the extra distinct job a
    value-less pivot runs, which matters when the fact table is 100 TB.
    Absent (group, value) combos are NULL in both engines."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(25,2)")
    )
    out = aggregation_operations(
        li,
        group_by=["l_returnflag"],
        operations=[
            {"column": "qty_dec", "operation": "sum", "alias": "sum_qty"},
            {"column": "l_orderkey", "operation": "count", "alias": "cnt"},
        ],
        pivot_column="l_linestatus",
        pivot_values=["F", "O"],
    )
    return out.select(
        "l_returnflag",
        F.col("F_sum_qty").cast("double").alias("F_sum_qty"),
        "F_cnt",
        F.col("O_sum_qty").cast("double").alias("O_sum_qty"),
        "O_cnt",
    )


# ---------------------------------------------------------------------------
# Generic window-function dispatch
# ---------------------------------------------------------------------------


@register(
    "q_window_dispatch",
    oracle=f"""
    WITH {_O_MONTHLY_DEC}
    SELECT custkey, order_month,
           CAST(total_spend AS DOUBLE) AS total_spend,
           ROW_NUMBER() OVER w AS rn,
           CAST(LEAD(total_spend, 1) OVER w AS DOUBLE) AS next_spend,
           CAST(FIRST_VALUE(total_spend) OVER w AS DOUBLE) AS first_spend
    FROM monthly
    WINDOW w AS (PARTITION BY custkey ORDER BY order_month ASC)
    """,
)
def q_window_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_operations name-dispatch (reference aggregation.py:11-57):
    row_number / lead / first_value in ONE window projection (single
    exchange + sort at scale)."""
    m = _monthly_orders_dec(spark, sf_dir)
    out = window_operations(
        m,
        partition_by=["custkey"],
        order_by=["order_month"],
        operations=[
            {"operation": "row_number", "alias": "rn"},
            {"column": "total_spend", "operation": "lead", "args": [1], "alias": "next_spend"},
            {"column": "total_spend", "operation": "first_value", "alias": "first_spend"},
        ],
    )
    return out.select(
        "custkey",
        "order_month",
        F.col("total_spend").cast("double").alias("total_spend"),
        "rn",
        F.col("next_spend").cast("double").alias("next_spend"),
        F.col("first_spend").cast("double").alias("first_spend"),
    )


# ---------------------------------------------------------------------------
# Top-1 by timestamp (orderBy desc + limit)
# ---------------------------------------------------------------------------


@register(
    "q_top1_latest",
    oracle="""
    SELECT user_id, ts, event_id
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1
    """,
)
def q_top1_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record probe — orderBy(desc).limit(1) (reference
    monitor.py:47-49). Spark plans this as TakeOrderedAndProject: no
    global sort, each partition contributes its top row."""
    e = load(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# Month-spine cross join (demographic snapshot materialization)
# ---------------------------------------------------------------------------


@register(
    "q_month_spine",
    oracle="""
    WITH f AS (
      SELECT o_custkey AS custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS first_month
      FROM orders
      GROUP BY 1
    ),
    s AS (
      SELECT CAST(r AS DATE) AS spine_month
      FROM range(DATE '1995-01-01', DATE '1996-01-01', INTERVAL 1 MONTH) t(r)
    )
    SELECT custkey, spine_month
    FROM f CROSS JOIN s
    WHERE spine_month >= first_month
    """,
)
def q_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month spine × entities with an activation filter — the reference's
    snapshot materialization (fs_cus_demographic.py:64-84,109-113), built
    with sequence/explode instead of driver-side pandas. The 12-row spine
    side broadcasts, so this is a map-side nested loop at any scale."""
    o = load(spark, sf_dir, "orders")
    first = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(F.trunc(F.col("o_orderdate").cast("date"), "month")).alias("first_month")
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("spine_month")
    )
    return (
        first.crossJoin(F.broadcast(spine))
        .filter(F.col("spine_month") >= F.col("first_month"))
        .select("custkey", "spine_month")
    )


# ---------------------------------------------------------------------------
# Feature-generation scalar chain
# ---------------------------------------------------------------------------


@register(
    "q_feature_chain",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_brand = 'Brand#13' THEN 'unknown' ELSE p_brand END AS p_brand,
           concat(CASE WHEN p_brand = 'Brand#13' THEN 'unknown' ELSE p_brand END, '_', p_type) AS brand_type,
           p_retailprice / p_size AS value_density,
           length(p_name) AS name_len,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'mid'
                ELSE 'large' END AS size_class
    FROM part
    """,
)
def q_feature_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar feature-generation chain: NA standardization → imputation →
    concat → arithmetic dispatch → allowlisted function dispatch → CASE
    builder (reference feature_generation.py / clean modules). All column
    expressions — one codegen stage, no UDFs."""
    p = load(spark, sf_dir, "part")
    p = standardize_na_values(p, ["p_brand"], na_values=["Brand#13"])
    p = impute_dataframe(p, {"p_brand": "unknown"})
    p = concat_columns(p, "brand_type", ["p_brand", "p_type"], separator="_")
    p = math_operations(p, "value_density", "p_retailprice", "p_size", "truediv")
    p = spark_function_operations(p, "name_len", "length", columns=["p_name"])
    p = choose_columns_as_value(
        p,
        "size_class",
        cases=[
            {"condition": "p_size < 10", "value": "small"},
            {"condition": "p_size < 30", "value": "mid"},
        ],
        default="large",
    )
    return p.select(
        "p_partkey", "p_brand", "brand_type", "value_density",
        "name_len", "size_class",
    )


# ---------------------------------------------------------------------------
# Layered sink → scan roundtrip
# ---------------------------------------------------------------------------


@register(
    "q_layer_roundtrip",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_rows, {_o_dsum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag
    """,
)
def q_layer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """save_table partitioned write (dynamic partition overwrite) →
    named-catalog registration (CREATE DATABASE / CREATE TABLE ... LOCATION,
    reference notebooks/utils.py:1896-1911) → ``spark.read.table("db.t")``
    read-back → aggregate. Exercises the layered sink/scan path end-to-end
    (reference storage_operations.py:19-57, 75-211); partitioning on the
    historical key means a re-run only rewrites affected partitions, and
    MSCK partition recovery makes them visible through the metastore."""
    from databricks_demo_feature_store_spark.queries import scratch_dir

    root = scratch_dir("layers")
    cat = Catalog(root=root, database="demo_db")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")
    )
    save_table(
        li,
        cat.path("lineitem_recent", "preprocessing"),
        fmt="parquet",
        mode="overwrite",
        partition_by=["l_returnflag"],
        partition_overwrite=True,
    )
    cat.register_table(
        spark, "lineitem_recent", "preprocessing", fmt="parquet", partitioned=True
    )
    back = cat.get_table(spark, "lineitem_recent", "preprocessing", fmt="parquet")
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(25,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "q_interval_join",
    oracle="""
    SELECT e1.user_id AS user_id,
           e1.event_id AS click_id,
           e2.event_id AS purchase_id,
           e1.ts AS click_ts,
           e2.ts AS purchase_ts
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >= e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    WHERE e1.event_type = 'click' AND e2.event_type = 'purchase'
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (click→purchase attribution within one hour, per user)
    through the bucketed interval_join operator — a hash equi-join on
    (user, time-bucket) plus an exact range filter, never a per-key cross
    product (the naive theta-join is quadratic per key at scale)."""
    from databricks_demo_feature_store_spark.operators import interval_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return interval_join(
        clicks, purchases, ["user_id"], "click_ts", "purchase_ts", 0.0, 3600.0
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")


@register(
    "q_rollup_hierarchy",
    oracle="""
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(GROUPING(event_type, CAST(ts AS DATE)) AS INT) AS lvl,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
    """,
)
def q_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (event_type → day → grand total) in ONE
    shuffle via GROUP BY ROLLUP — Catalyst expands the grouping sets in
    a single Expand+HashAggregate instead of three jobs + union; the
    grouping_id column disambiguates subtotal NULLs from data NULLs.
    The DECIMAL-routed sum keeps every level bit-identical; the day is
    emitted as yyyy-MM-dd text so subtotal NULLs survive pandas/Arrow
    dtype coercion identically on both engines."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return (
        ev.rollup("event_type", "day")
        .agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "lvl",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_filter_dict",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           {_o_dsum('o.o_totalprice', 2)} AS sum_price
    FROM (SELECT * FROM orders
          WHERE o_orderstatus = 'O' AND o_totalprice > 50000.0) o
    JOIN (SELECT * FROM customer
          WHERE c_acctbal >= 0.0) c
      ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_filter_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-of-DataFrames filter (reference
    ``src/packages/preprocessing/filter/dataframe.py:76-116``): per-table
    condition lists applied in one pass, tables without parameters pass
    through. Unlike the reference's ``_filter_dataframe`` this stays lazy
    (no before/after ``count()`` jobs), so both conjunctions reach the
    parquet scans as pushed filters before the join."""
    from databricks_demo_feature_store_spark.operators import filter_dataframes

    filtered = filter_dataframes(
        {
            "orders": {"conditions": ["o_orderstatus = 'O'", "o_totalprice > 50000.0"]},
            "customer": {"conditions": ["c_acctbal >= 0.0"]},
            "nation": {},  # pass-through branch
        },
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
        nation=load(spark, sf_dir, "nation"),
    )
    return (
        filtered["orders"]
        .join(
            filtered["customer"],
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Left-semi join (EXISTS) — TPC-H Q4 shape
# ---------------------------------------------------------------------------


@register(
    "q_semi_join_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join: orders (in a 3-month window) with at
    least one lineitem shipped >90 days after the order date, counted per
    priority. TPC-H Q4 shape adapted to this schema's columns.

    left_semi hash join on the order key (the date predicate rides along
    as a join filter) — never materializes the match side, broadcast-able
    when the filtered lineitem side is small, AQE-skew-safe otherwise.
    """
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Feature scaling (z-score + min-max per group)
# ---------------------------------------------------------------------------


@register(
    "q_feature_scaling",
    oracle=f"""
    WITH m AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
             -- DECIMAL(19,6) forces DuckDB onto HUGEINT storage (int64
             -- multiply overflows); still exact, so the DOUBLE round-trip
             -- matches Spark's DECIMAL(18,6)*DECIMAL(18,6) product.
             CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6)) * CAST(c_acctbal AS DECIMAL(19,6))) OVER w AS DOUBLE) AS s2,
             COUNT(c_acctbal) OVER w AS n,
             MIN(c_acctbal) OVER w AS mn,
             MAX(c_acctbal) OVER w AS mx
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment)
    ),
    v AS (
      SELECT *, (s2 - s1 * s1 / n) / (n - 1) AS var FROM m
    )
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CASE WHEN n > 1 AND var > 0
                THEN {oracle_dround('(c_acctbal - s1 / n) / sqrt(var)', 6)}
           END AS c_acctbal_zscore,
           CASE WHEN mx > mn
                THEN {oracle_dround('(c_acctbal - mn) / (mx - mn)', 6)}
           END AS c_acctbal_minmax
    FROM v
    """,
)
def q_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score and min-max scaling of customer account balance.

    Exact-decimal moment sums (order-independent) combined in double
    arithmetic — bit-identical across engines and partitionings, unlike
    streaming ``stddev_samp``. One window shuffle on the group key.
    """
    from databricks_demo_feature_store_spark.functions.scaling import scale_features

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    out = scale_features(
        cust, ["c_acctbal"], method="zscore", group_by=["c_mktsegment"]
    )
    out = scale_features(
        out, ["c_acctbal"], method="minmax", group_by=["c_mktsegment"]
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        "c_acctbal_zscore",
        "c_acctbal_minmax",
    )


@register(
    "q_salted_join",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           o.o_orderdate, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join vs the plain-join oracle: the deterministic salt
    explode/unsalt round-trip must be invisible in the result — exactly
    the guarantee a skewed 100 TB fact join relies on."""
    from databricks_demo_feature_store_spark.operators.joins import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderdate", "o_totalprice")
    out = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        keys=["k"],
        salt_buckets=8,
        salt_source="l_linenumber",
    )
    return out.select(
        F.col("k").alias("l_orderkey"),
        "l_linenumber",
        "l_quantity",
        "o_orderdate",
        "o_totalprice",
    )


@register(
    "q_rolling_quantile",
    oracle=f"""
    WITH m AS (
      SELECT o_custkey AS custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total_spend
      FROM orders GROUP BY 1, 2
    )
    SELECT custkey, order_month, total_spend,
           {oracle_dround('quantile_cont(total_spend, 0.5) OVER f3')} AS total_spend_rq50_3m,
           {oracle_dround('quantile_cont(total_spend, 0.9) OVER f3')} AS total_spend_rq90_3m
    FROM m
    WINDOW f3 AS (PARTITION BY custkey ORDER BY order_month ASC
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-month exact median and p90 of the monthly spend series
    — robust rolling statistics sharing the single per-entity sort."""
    from databricks_demo_feature_store_spark.operators.windows import (
        rolling_quantiles,
    )

    m = _monthly_orders_dec(spark, sf_dir).select(
        "custkey", "order_month", F.col("total_spend").cast("double").alias("total_spend")
    )
    return rolling_quantiles(
        m,
        columns=["total_spend"],
        quantiles=[0.5, 0.9],
        window_sizes=[3],
        partition_by=["custkey"],
        order_by=["order_month"],
    )


@register(
    "q_rolling_ewma",
    oracle=f"""
    WITH m AS (
      SELECT o_custkey AS custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total_spend
      FROM orders GROUP BY 1, 2
    ),
    w AS (
      SELECT custkey, order_month, total_spend,
             list(total_spend) OVER f6 AS xs
      FROM m
      WINDOW f6 AS (PARTITION BY custkey ORDER BY order_month ASC
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT custkey, order_month, total_spend,
           {oracle_dround('list_sum(list_transform(range(1, len(xs) + 1), i -> CASE WHEN xs[i] IS NOT NULL THEN pow(0.5, len(xs) - i) * xs[i] ELSE 0.0 END)) / NULLIF(list_sum(list_transform(range(1, len(xs) + 1), i -> CASE WHEN xs[i] IS NOT NULL THEN pow(0.5, len(xs) - i) ELSE 0.0 END)), 0.0)')} AS total_spend_ewma6m
    FROM w
    """,
)
def q_rolling_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 6-month EWMA (α=0.5, adjusted) of the monthly spend
    series — the oracle replays the identical weight fold in list
    algebra (NULL slots keep their row-offset decay but contribute no
    mass, matching the operator), so even the accumulation order is
    checked."""
    from databricks_demo_feature_store_spark.operators.windows import rolling_ewma

    m = _monthly_orders_dec(spark, sf_dir).select(
        "custkey", "order_month", F.col("total_spend").cast("double").alias("total_spend")
    )
    return rolling_ewma(
        m,
        columns=["total_spend"],
        alpha=0.5,
        window_sizes=[6],
        partition_by=["custkey"],
        order_by=["order_month"],
    )


@register(
    "q_unpivot_melt",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(25,2)) END) AS DOUBLE) AS F_sum_qty,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(25,2)) END) AS DOUBLE) AS O_sum_qty
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, u.variable, u.value
    FROM wide
    UNPIVOT INCLUDE NULLS (value FOR variable IN (F_sum_qty, O_sum_qty)) AS u
    """,
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt), the inverse of the conditional pivot:
    pivot per-status quantity sums to wide, then stack back to long —
    a Generate at scan speed, no shuffle beyond the pivot's own agg.
    The oracle uses DuckDB's native UNPIVOT (INCLUDE NULLS to match the
    stack semantics for absent combinations)."""
    from databricks_demo_feature_store_spark.operators.aggregation import (
        aggregation_operations,
        unpivot_columns,
    )

    li = load(spark, sf_dir, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(25,2)")
    )
    wide = aggregation_operations(
        li,
        group_by=["l_returnflag"],
        operations=[{"column": "qty_dec", "operation": "sum", "alias": "sum_qty"}],
        pivot_column="l_linestatus",
        pivot_values=["F", "O"],
    ).select(
        "l_returnflag",
        # single-agg pivot names columns by pivot value alone
        F.col("F").cast("double").alias("F_sum_qty"),
        F.col("O").cast("double").alias("O_sum_qty"),
    )
    return unpivot_columns(
        wide, id_cols=["l_returnflag"], value_cols=["F_sum_qty", "O_sum_qty"]
    )


@register(
    "q_fill_gaps_interpolate",
    oracle=f"""
    WITH m AS (
      SELECT o_custkey AS custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total_spend
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (
      SELECT custkey, MIN(order_month) AS m0, MAX(order_month) AS m1
      FROM m GROUP BY custkey
    ),
    spine AS (
      SELECT custkey,
             CAST(unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS DATE) AS order_month
      FROM bounds
    ),
    dense AS (
      SELECT s.custkey, s.order_month, m.total_spend
      FROM spine s LEFT JOIN m USING (custkey, order_month)
    ),
    n AS (
      SELECT custkey, order_month, total_spend,
             LAST_VALUE(total_spend IGNORE NULLS) OVER back AS prev,
             LAST_VALUE(CASE WHEN total_spend IS NOT NULL THEN order_month END IGNORE NULLS) OVER back AS prev_m,
             FIRST_VALUE(total_spend IGNORE NULLS) OVER fwd AS nxt,
             FIRST_VALUE(CASE WHEN total_spend IS NOT NULL THEN order_month END IGNORE NULLS) OVER fwd AS nxt_m
      FROM dense
      WINDOW back AS (PARTITION BY custkey ORDER BY order_month ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd AS (PARTITION BY custkey ORDER BY order_month ASC
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT custkey, order_month, total_spend,
           -- floor-quantized double interpolation: the blend is pure
           -- IEEE arithmetic both engines evaluate identically; the
           -- quantization is floor(x*1e6 + 0.5), never a double->DECIMAL
           -- ROUND (engine-dependent at the 1e-6 boundaries the blend
           -- hits whenever gap | numerator; measured at sf0.1, round 12)
           CAST(CAST(floor((CASE
             WHEN total_spend IS NOT NULL THEN total_spend
             WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
               prev + (nxt - prev)
                 * (CAST(date_diff('month', prev_m, order_month) AS DOUBLE)
                    / CAST(date_diff('month', prev_m, nxt_m) AS DOUBLE))
           END) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS total_spend_filled
    FROM n
    """,
)
def q_fill_gaps_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse→dense monthly resample with linear interpolation: every
    month between each customer's first and last order appears, gap
    months carry the linearly interpolated spend — the densify step that
    keeps lag/rolling features honest over gappy series. One hash agg
    (bounds) + sequence explode for the spine, and both neighbor scans
    share one ascending (entity, month) sort."""
    from databricks_demo_feature_store_spark.operators.windows import (
        fill_monthly_gaps,
    )

    m = _monthly_orders_dec(spark, sf_dir).select(
        "custkey", "order_month",
        F.col("total_spend").cast("double").alias("total_spend"),
    )
    return fill_monthly_gaps(
        m, "custkey", "order_month", ["total_spend"], round_to=6,
        stable_quantize=True,
    )


@register(
    "q_target_encoding",
    oracle="""
    -- floor-quantized double replay: the encoding expression is pure
    -- IEEE double arithmetic evaluated identically by both engines; the
    -- final quantization is floor(x*1e6 + 0.5) (engine-stable), NOT a
    -- double->DECIMAL ROUND, which flips last digits at the 1e-6
    -- boundaries a sum/count ratio hits (measured at sf0.1, round 12)
    WITH stats AS (
      SELECT o_orderpriority,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS s,
             COUNT(o_totalprice) AS c
      FROM orders GROUP BY o_orderpriority
    ),
    g AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(o_totalprice) AS gmean
      FROM orders
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(CAST(floor(COALESCE(
             (CAST(st.s - CAST(o.o_totalprice AS DECIMAL(25,6)) AS DOUBLE)
                + 20.0 * g.gmean)
             / (CAST(st.c - 1 AS DOUBLE) + 20.0),
             g.gmean) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
             AS o_orderpriority_target_enc
    FROM orders o
    LEFT JOIN stats st ON o.o_orderpriority = st.o_orderpriority
    CROSS JOIN g""",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of order priority against
    order value — the high-cardinality categorical feature with the
    training-leakage guard. One DECIMAL-exact category aggregation +
    broadcast global mean + join-back; the oracle replays the shrinkage
    arithmetic exactly."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        target_encode,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = target_encode(
        o, "o_orderpriority", "o_totalprice", smoothing=20.0, leave_one_out=True
    )
    return out.select("o_orderkey", "o_orderpriority", "o_orderpriority_target_enc")


@register(
    "q_train_test_split",
    oracle=f"""
    WITH b AS (
      SELECT c_custkey,
             ({{h}}) % 10000 AS bucket
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN bucket < 2000 THEN 'test'
                WHEN bucket < 3000 THEN 'val'
                ELSE 'train' END AS split
    FROM b
    """.format(h="CAST(concat('0x', substr(md5(concat('42:', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT)"),
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic entity-level train/val/test assignment (20/10/70) by
    key hash — stable across runs/engines/partitionings, every row of an
    entity in one split (no rand(), no entity leakage). Oracle replays
    the hash-bucket thresholds."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        train_test_split_col,
    )

    c = load(spark, sf_dir, "customer").select("c_custkey")
    return c.select(
        "c_custkey",
        train_test_split_col(
            F.col("c_custkey"), test_fraction=0.2, val_fraction=0.1
        ).alias("split"),
    )


@register(
    "q_quantile_bin",
    oracle=f"""
    WITH {_O_MONTHLY_DEC}
    SELECT custkey, order_month,
           CAST(total_spend AS DOUBLE) AS total_spend,
           NTILE(10) OVER (ORDER BY total_spend ASC, custkey ASC,
                           order_month ASC) AS total_spend_qbin10
    FROM monthly
    """,
)
def q_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of monthly spend (global ntile
    with a deterministic (value, entity, month) total order). The oracle
    replays the identical ntile assignment — Spark and DuckDB share the
    larger-groups-first ntile definition."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        quantile_bin,
    )

    m = _monthly_orders_dec(spark, sf_dir)
    out = quantile_bin(
        m, "total_spend", 10, tiebreak_cols=["custkey", "order_month"]
    )
    return out.select(
        "custkey", "order_month",
        F.col("total_spend").cast("double").alias("total_spend"),
        "total_spend_qbin10",
    )


@register(
    "q_feature_correlations",
    oracle="""
    SELECT * FROM (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             ROUND(corr(CAST(l_quantity AS DOUBLE),
                        CAST(l_extendedprice AS DOUBLE)), 6) AS pearson_corr
      FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_discount',
             ROUND(corr(CAST(l_quantity AS DOUBLE),
                        CAST(l_discount AS DOUBLE)), 6)
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount',
             ROUND(corr(CAST(l_extendedprice AS DOUBLE),
                        CAST(l_discount AS DOUBLE)), 6)
      FROM lineitem
    )
    """,
)
def q_feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of three lineitem measures in one
    scan (all corr aggregates share the pass, map-side combined) — the
    collinearity screen before feature selection."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        feature_correlations,
    )

    li = load(spark, sf_dir, "lineitem")
    return feature_correlations(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )


@register(
    "q_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS step1_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    allu AS (SELECT DISTINCT user_id FROM events),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS step2_ts
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.step1_ts
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS step3_ts
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts
      GROUP BY e.user_id
    )
    SELECT a.user_id, s1.step1_ts, s2.step2_ts, s3.step3_ts,
           CAST((s1.user_id IS NOT NULL)::INT + (s2.user_id IS NOT NULL)::INT
                + (s3.user_id IS NOT NULL)::INT AS INT) AS steps_completed
    FROM allu a
    LEFT JOIN s1 ON a.user_id = s1.user_id
    LEFT JOIN s2 ON a.user_id = s2.user_id
    LEFT JOIN s3 ON a.user_id = s3.user_id
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel over the event stream: per
    user, the first view, the first click after it, the first purchase
    after that — chained conditional MINs on one per-user grouping, no
    per-step self-join of the raw events, no event sorting. The oracle
    replays the step chain with correlated CTEs."""
    from databricks_demo_feature_store_spark.operators.events import funnel_steps

    e = load(spark, sf_dir, "events")
    return funnel_steps(e, ["view", "click", "purchase"])


@register(
    "q_retention_cohorts",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_period
      FROM events GROUP BY user_id
    ),
    offsets AS (
      SELECT DISTINCT e.user_id, p.cohort_period,
             CAST(date_diff('day', p.cohort_period,
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
               AS period_offset
      FROM events e JOIN per_user p ON e.user_id = p.user_id
    ),
    counts AS (
      SELECT cohort_period, period_offset,
             COUNT(DISTINCT user_id) AS n_active
      FROM offsets GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_period, n_active AS sz FROM counts WHERE period_offset = 0
    )
    SELECT c.cohort_period, c.period_offset, c.n_active,
           ROUND(CAST(c.n_active AS DOUBLE) / s.sz, 6) AS retained_fraction
    FROM counts c JOIN sizes s ON c.cohort_period = s.cohort_period
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle at WEEK grain (the synthetic events span
    one month, so weekly cohorts give a real 5x5 triangle where monthly
    would be a single vacuous cell): users cohorted by first active ISO
    week, activity counted at each week offset, retained fraction against
    the cohort size — one per-user aggregation (first week + bounded
    distinct-week set) plus an explode, never a users×weeks cross
    join."""
    from databricks_demo_feature_store_spark.operators.events import (
        retention_cohorts,
    )

    e = load(spark, sf_dir, "events")
    return retention_cohorts(e, grain="week")


@register(
    "q_bin_by_cutpoints",
    oracle=f"""
    WITH {_O_MONTHLY_DEC},
    m2 AS (SELECT custkey, order_month,
                  CAST(total_spend AS DOUBLE) AS total_spend
           FROM monthly),
    cuts AS (
      SELECT quantile_cont(total_spend, 0.25) AS q1,
             quantile_cont(total_spend, 0.50) AS q2,
             quantile_cont(total_spend, 0.75) AS q3
      FROM m2
    )
    SELECT m2.custkey, m2.order_month, m2.total_spend,
           CAST(1 + (m2.total_spend > c.q1)::INT + (m2.total_spend > c.q2)::INT
                  + (m2.total_spend > c.q3)::INT AS INT) AS total_spend_bin
    FROM m2 CROSS JOIN cuts c
    """,
)
def q_bin_by_cutpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-then-assign binning, the 100 TB path: exact quartile cutpoints
    fitted as ONE aggregate row, broadcast, then every row binned with a
    per-row fold over the cutpoint array — no global sort of the data
    being binned (contrast q_quantile_bin's ntile form). Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear
    interpolation definition, so the oracle replays the fit too."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        assign_bins,
    )

    m = _monthly_orders_dec(spark, sf_dir).select(
        "custkey", "order_month",
        F.col("total_spend").cast("double").alias("total_spend"),
    )
    cutpoints = m.agg(
        F.percentile(
            F.col("total_spend"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("__q")
    ).select(F.explode("__q").alias("cutpoint"))
    return assign_bins(m, "total_spend", cutpoints)


@register(
    "q_event_attribution",
    oracle="""
    WITH typed AS (
      SELECT user_id, event_type, value, ts, event_id,
             COALESCE(CAST(event_type AS VARCHAR), '__null__') AS cat
      FROM events
    ),
    t AS (
      SELECT user_id, event_type, value,
             LAST_VALUE(CASE WHEN cat <> 'purchase' THEN cat END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
      FROM typed
    )
    SELECT COALESCE(ch, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase credits the
    user's most recent strictly-preceding non-purchase event type
    ('direct' when none, NULL types as the '__null__' channel per the
    shared event-sequence convention) — one per-user partitioned window with a
    (ts, event_id) deterministic order, then a per-channel rollup with
    a DECIMAL-routed value sum. The oracle replays the same
    last-value-ignore-nulls frame."""
    from databricks_demo_feature_store_spark.operators.events import (
        last_touch_attribution,
    )

    e = load(spark, sf_dir, "events")
    return last_touch_attribution(e, "purchase")


@register(
    "q_event_transitions",
    oracle="""
    WITH typed AS (
      SELECT user_id, ts, event_id,
             COALESCE(CAST(event_type AS VARCHAR), '__null__') AS cat
      FROM events
    ),
    pairs AS (
      SELECT COALESCE(LAG(cat) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC), '__start__') AS from_type,
             cat AS to_type
      FROM typed
    ),
    counts AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM pairs GROUP BY 1, 2
    ),
    margins AS (
      SELECT from_type, SUM(n_transitions) AS row_total FROM counts GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           CAST(ROUND(CAST(CAST(c.n_transitions AS DOUBLE) / CAST(m.row_total AS DOUBLE)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS probability
    FROM counts c JOIN margins m USING (from_type)
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences
    (entry transitions from '__start__' included): one per-user lag
    window + one pair aggregation; probabilities against the broadcast
    per-from_type margin. The oracle replays the lag and the
    row-normalization."""
    from databricks_demo_feature_store_spark.operators.events import (
        event_transitions,
    )

    return event_transitions(load(spark, sf_dir, "events"))


@register(
    "q_chi2_association",
    oracle="""
    WITH cells AS (
      SELECT COALESCE(CAST(o_orderpriority AS VARCHAR), '__null__') AS a,
             COALESCE(CAST(o_orderstatus AS VARCHAR), '__null__') AS b,
             COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rm AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
    cm AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
    t AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c FROM cells),
    s AS (
      SELECT n, r, c,
             SUM((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                 - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) AS tsum
      FROM cells JOIN rm USING (a) JOIN cm USING (b) CROSS JOIN t
      GROUP BY n, r, c
    )
    SELECT 'o_orderpriority' AS col_a, 'o_orderstatus' AS col_b,
           CAST(ROUND(CAST(tsum + CAST(n AS DOUBLE) AS DECIMAL(38,10)), 6) AS DOUBLE) AS chi2,
           CAST(ROUND(CAST(
             CASE WHEN (r - 1) * (c - 1) > 0
                  THEN sqrt((tsum + CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) * CAST(LEAST(r - 1, c - 1) AS DOUBLE)))
                  ELSE 0.0 END AS DECIMAL(38,10)), 6) AS DOUBLE) AS cramers_v,
           CAST((r - 1) * (c - 1) AS INT) AS dof,
           CAST(n AS BIGINT) AS n
    FROM s
    """,
)
def q_chi2_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square association + Cramer's V between order priority and
    order status — the categorical feature-selection screen next to
    q_feature_correlations. One contingency aggregation plus broadcast
    margins; unobserved cells handled by the telescoping identity (no
    r x c materialization). The oracle replays the identical identity."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        chi2_association,
    )

    return chi2_association(
        load(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


@register(
    "q_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT COALESCE(CAST(o_orderpriority AS VARCHAR), '__null__') AS a,
             COALESCE(CAST(o_orderstatus AS VARCHAR), '__null__') AS b,
             COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rm AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
    cm AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
    t AS (SELECT SUM(o) AS n FROM cells)
    SELECT 'o_orderpriority' AS col_a, 'o_orderstatus' AS col_b,
           CAST(ROUND(CAST(SUM(
             (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))
           ) AS DECIMAL(38,10)), 6) AS DOUBLE) AS mutual_info,
           CAST(n AS BIGINT) AS n
    FROM cells JOIN rm USING (a) JOIN cm USING (b) CROSS JOIN t
    GROUP BY n
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between order priority and status —
    the strength companion to q_chi2_association, same one-contingency
    scale shape, observed cells only (0 ln 0 = 0). The oracle replays
    the identical sum."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        mutual_information,
    )

    return mutual_information(
        load(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


@register(
    "q_winsorize",
    oracle="""
    WITH fit AS (
      SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS p_lo,
             quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS p_hi,
             quantile_cont(CAST(l_quantity AS DOUBLE), 0.05) AS q_lo,
             quantile_cont(CAST(l_quantity AS DOUBLE), 0.95) AS q_hi
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
           CAST(l_quantity AS DOUBLE) AS l_quantity,
           CAST(ROUND(CAST(LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE), p_lo), p_hi)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS l_extendedprice_wins,
           CAST(ROUND(CAST(LEAST(GREATEST(CAST(l_quantity AS DOUBLE), q_lo), q_hi)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS l_quantity_wins
    FROM lineitem CROSS JOIN fit
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile clipping of two lineitem measures at [p05, p95]: all
    cutpoints fitted in ONE aggregate row, broadcast, then row-local
    least/greatest — the fact table never shuffles. Spark's exact
    percentile and DuckDB's quantile_cont share the interpolation
    definition, so the oracle replays the fit."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        winsorize,
    )

    from databricks_demo_feature_store_spark.functions.rounding import dround

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
    )
    out = winsorize(li, ["l_extendedprice", "l_quantity"], 0.05, 0.95)
    return out.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity",
        dround("l_extendedprice_wins", 6).alias("l_extendedprice_wins"),
        dround("l_quantity_wins", 6).alias("l_quantity_wins"),
    )


@register(
    "q_event_decay",
    oracle="""
    SELECT user_id,
           CAST(ROUND(SUM(CAST(pow(0.5, ((epoch_us(TIMESTAMP '2024-02-01') - epoch_us(ts)) / 1000000.0)
                                        / 86400.0 / 7.0) AS DECIMAL(25,10))), 6) AS DOUBLE) AS decayed_count,
           CAST(ROUND(SUM(CAST(CAST(value AS DOUBLE)
                               * pow(0.5, ((epoch_us(TIMESTAMP '2024-02-01') - epoch_us(ts)) / 1000000.0)
                                          / 86400.0 / 7.0) AS DECIMAL(25,10))), 6) AS DOUBLE) AS decayed_value
    FROM events
    WHERE ts <= TIMESTAMP '2024-02-01'
    GROUP BY user_id
    """,
)
def q_event_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed per-user event aggregates (half-life
    7 days against a 2024-02-01 reference): recency-weighted count and
    value in one map-side-combinable aggregation, with per-term DECIMAL
    quantization so the sums are partition-order- and engine-exact.
    The oracle replays the weight formula term-by-term."""
    from databricks_demo_feature_store_spark.operators.events import time_decay_agg

    return time_decay_agg(
        load(spark, sf_dir, "events"), "2024-02-01", half_life_days=7.0
    )


@register(
    "q_key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT COALESCE(CAST(o_custkey AS VARCHAR), '__null__') AS key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT SUM(n_rows) AS total, COUNT(*) AS k, MAX(n_rows) AS mx FROM counts
    ),
    e AS (
      SELECT SUM(-(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE))
                 * ln(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE))) AS entropy
      FROM counts CROSS JOIN t
    ),
    top AS (
      SELECT key, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC) AS rank
      FROM counts
      ORDER BY n_rows DESC, key ASC LIMIT 10
    )
    SELECT CAST(rank AS INT) AS rank, key, n_rows,
           CAST(ROUND(CAST(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS share,
           CAST(total AS BIGINT) AS total_rows,
           CAST(k AS BIGINT) AS distinct_keys,
           CAST(ROUND(CAST(CAST(mx AS DOUBLE) / CAST(total AS DOUBLE)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS max_share,
           CAST(ROUND(CAST(CASE WHEN k > 1 THEN entropy / ln(CAST(k AS DOUBLE))
                                ELSE 1.0 END AS DECIMAL(38,10)), 6) AS DOUBLE) AS balance
    FROM top CROSS JOIN t CROSS JOIN e
    """,
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for orders.o_custkey: the 10 hottest keys
    with shares, plus distribution summary (max_share = straggler
    bound, balance = normalized entropy) — the measurement behind the
    salted_join knob. One key aggregation + two tiny summary aggs +
    TakeOrdered; never a full sort. The oracle replays counts, top-N
    and the entropy."""
    from databricks_demo_feature_store_spark.operators.diagnostics import (
        key_skew_profile,
    )

    return key_skew_profile(load(spark, sf_dir, "orders"), "o_custkey", top_n=10)


@register(
    "q_join_size_estimate",
    oracle="""
    WITH lc AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS nl
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
    ),
    rc AS (
      SELECT CAST(c_custkey AS VARCHAR) AS key, COUNT(*) AS nr
      FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT lc.key, CAST(nl AS DECIMAL(38,0)) * nr AS o
      FROM lc JOIN rc USING (key)
    ),
    t AS (
      SELECT SUM(o) AS join_rows, COUNT(*) AS matched FROM pairs
    ),
    top AS (
      SELECT key AS top_key, o AS top_rows
      FROM pairs ORDER BY o DESC, key DESC LIMIT 1
    ),
    lt AS (SELECT COUNT(*) AS lrows FROM orders),
    rt AS (SELECT COUNT(*) AS rrows FROM customer)
    SELECT CAST(COALESCE(join_rows, 0) AS BIGINT) AS join_rows,
           CAST(lrows AS BIGINT) AS left_rows,
           CAST(rrows AS BIGINT) AS right_rows,
           CAST(matched AS BIGINT) AS matched_keys,
           CAST(ROUND(CAST(CAST(join_rows AS DOUBLE) / CAST(lrows + rrows AS DOUBLE)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS amplification,
           top_key,
           CAST(top_rows AS BIGINT) AS top_key_rows,
           CAST(ROUND(CAST(CAST(top_rows AS DOUBLE) / CAST(join_rows AS DOUBLE)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS top_key_share
    FROM t CROSS JOIN top CROSS JOIN lt CROSS JOIN rt
    """,
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact inner-join output size WITHOUT running the join (sum of
    per-key count products over a join of COUNT frames) plus
    amplification and the dominant key's output share — the pre-flight
    check before a fact-fact join at scale. The oracle replays the
    count-product arithmetic."""
    from databricks_demo_feature_store_spark.operators.diagnostics import (
        join_size_estimate,
    )

    return join_size_estimate(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )


@register(
    "q_table_diff",
    oracle="""
    WITH before AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0
    ),
    after AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN '0-RUSH' ELSE o_orderpriority END AS o_orderpriority,
             o_totalprice
      FROM orders WHERE o_orderkey % 17 <> 0
    ),
    j AS (
      SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
             b.o_orderkey IS NOT NULL AS in_b,
             a.o_orderkey IS NOT NULL AS in_a,
             (b.o_orderpriority IS NOT DISTINCT FROM a.o_orderpriority)
               AND (b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice) AS same
      FROM before b FULL OUTER JOIN after a ON b.o_orderkey = a.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_b THEN 'added'
                WHEN NOT in_a THEN 'removed'
                WHEN same THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM j
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff on the order key: a deterministic 'next version'
    (every 17th order dropped, every 5th re-prioritized, every 13th
    newly added) against the previous one — one null-safe full-outer
    join, row-local status. The review surface before promoting a
    versioned write; the oracle replays the join and the status CASE."""
    from databricks_demo_feature_store_spark.operators.history import table_diff

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    before = o.where(F.col("o_orderkey") % 13 != 0)
    after = o.where(F.col("o_orderkey") % 17 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("0-RUSH")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return table_diff(before, after, ["o_orderkey"])


@register(
    "q_scd2_intervals",
    oracle="""
    WITH snaps AS (
      SELECT user_id, CAST(ts AS DATE) AS snap_day,
             MAX(event_type) AS state
      FROM events GROUP BY 1, 2
    ),
    flagged AS (
      SELECT user_id, snap_day, state,
             CASE WHEN LAG(snap_day) OVER w IS NULL
                  OR state IS DISTINCT FROM LAG(state) OVER w
                  THEN 1 ELSE 0 END AS new_run
      FROM snaps
      WINDOW w AS (PARTITION BY user_id ORDER BY snap_day ASC)
    ),
    runs AS (
      SELECT user_id, snap_day, state,
             SUM(new_run) OVER (PARTITION BY user_id ORDER BY snap_day ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM flagged
    ),
    per_run AS (
      SELECT user_id, run, MIN(snap_day) AS effective_from,
             MIN(state) AS state
      FROM runs GROUP BY 1, 2
    )
    SELECT user_id, state,
           CAST(effective_from AS TIMESTAMP) AS effective_from,
           CAST(LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from ASC) AS TIMESTAMP) AS effective_to,
           LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from ASC) IS NULL AS is_current
    FROM per_run
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 compression of a daily per-user state series (max event
    type per day): unbroken runs of identical state collapse into
    validity intervals with effective_from/effective_to/is_current —
    gaps-and-islands on ONE per-user sort, storage linear in CHANGES
    not snapshots. The oracle replays flagging, run numbering and the
    interval bounds."""
    from databricks_demo_feature_store_spark.operators.history import build_scd2

    snaps = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id", F.col("ts").cast("date").alias("snap_day")
        )
        .agg(F.max("event_type").alias("state"))
    )
    out = build_scd2(snaps, ["user_id"], ["state"], "snap_day")
    return out.select(
        "user_id", "state",
        F.col("effective_from").cast("timestamp").alias("effective_from"),
        F.col("effective_to").cast("timestamp").alias("effective_to"),
        "is_current",
    )


@register(
    "q_rank_normalize",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           CAST(ROUND(CAST(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                                ORDER BY c_acctbal ASC)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS c_acctbal_pctrank
    FROM customer
    """,
)
def q_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment rank normalization of the customer balance
    (percent_rank in [0,1] — the monotone-invariant scaling that
    neutralizes skew where z-scores cannot). One partitioned window;
    the oracle replays the identical frame."""
    from databricks_demo_feature_store_spark.operators.windows import (
        rank_normalize,
    )

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    return rank_normalize(c, ["c_acctbal"], ["c_mktsegment"])


@register(
    "q_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT c_mktsegment, quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5) AS med
      FROM customer GROUP BY 1
    ),
    mad AS (
      SELECT c.c_mktsegment,
             quantile_cont(ABS(CAST(c.c_acctbal AS DOUBLE) - m.med), 0.5) AS mad,
             ANY_VALUE(m.med) AS med
      FROM customer c JOIN med m USING (c_mktsegment)
      GROUP BY 1
    )
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           CAST(ROUND(CAST(CASE WHEN c.c_acctbal IS NOT NULL AND mad > 0
                THEN 0.6745 * (CAST(c.c_acctbal AS DOUBLE) - med) / mad END
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS c_acctbal_robust_z,
           (COALESCE(ABS(CASE WHEN c.c_acctbal IS NOT NULL AND mad > 0
                THEN 0.6745 * (CAST(c.c_acctbal AS DOUBLE) - med) / mad END) > 3.5, FALSE)
            OR COALESCE(mad = 0 AND c.c_acctbal IS NOT NULL
                        AND CAST(c.c_acctbal AS DOUBLE) <> med, FALSE)) AS c_acctbal_is_outlier
    FROM customer c JOIN mad USING (c_mktsegment)
    """,
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD modified-z outlier flags on the customer balance per
    market segment (Iglewicz-Hoaglin 3.5 cut): two grouped exact-median
    aggregations broadcast back — the outliers cannot inflate the scale
    estimate, unlike mean/stddev z-scores. The oracle replays median,
    MAD and the flag rule."""
    from databricks_demo_feature_store_spark.functions.quality import (
        robust_outlier_flags,
    )

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    return robust_outlier_flags(c, "c_acctbal", ["c_mktsegment"])


@register(
    "q_backtest_folds",
    oracle="""
    WITH folds(f, cut) AS (
      VALUES (0, TIMESTAMP '1996-01-01 00:00:00'),
             (1, TIMESTAMP '1996-07-01 00:00:00'),
             (2, TIMESTAMP '1997-01-01 00:00:00')
    ),
    long AS (
      SELECT o.o_orderkey, f.f AS fold,
             CASE
               WHEN o.o_orderdate <= f.cut THEN 'train'
               WHEN o.o_orderdate <= f.cut + INTERVAL 90 DAY THEN 'test'
             END AS split
      FROM orders o CROSS JOIN folds f
    )
    SELECT CAST(fold AS INT) AS fold, split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM long WHERE split IS NOT NULL
    GROUP BY fold, split
    """,
)
def q_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest folds over orders: three expanding-window
    cutoffs, 90-day test horizons; the gate compares per-(fold, split)
    row counts and key ranges. The fold boundaries are caller literals
    (no data pre-scan) and the horizon is fixed-duration day arithmetic,
    so the long frame is engine-exact."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        backtest_folds,
    )

    o = load(spark, sf_dir, "orders")
    long = backtest_folds(
        o, "o_orderdate", ["1996-01-01", "1996-07-01", "1997-01-01"], 90
    )
    return long.groupBy("fold", "split").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    ).select(F.col("fold").cast("int").alias("fold"), "split", "n_rows", "min_key", "max_key")


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    d = repr(float(damping))
    tele = repr(1.0 - float(damping))
    r12 = lambda expr: (  # noqa: E731
        f"CAST({oracle_dround(expr, 12)} AS DECIMAL(38,12))"
    )
    its = []
    prev = "r0"
    for i in range(1, iterations + 1):
        its.append(f"""
    c{i} AS MATERIALIZED (
      SELECT e.dst AS node,
             SUM({r12(f'CAST({prev}.rank AS DOUBLE) / CAST({prev}.d AS DOUBLE)')}) AS inm
      FROM {prev} JOIN e ON {prev}.node = e.src
      WHERE {prev}.d IS NOT NULL
      GROUP BY e.dst
    ),
    d{i} AS (
      SELECT COALESCE(SUM(rank), CAST(0 AS DECIMAL(38,12))) AS dang
      FROM {prev} WHERE d IS NULL
    ),
    r{i} AS MATERIALIZED (
      SELECT b.node, b.d,
             {r12(
                 f"{tele} / CAST(nn.n AS DOUBLE) + {d} * ("
                 f"CAST(COALESCE(c{i}.inm, 0) AS DOUBLE)"
                 f" + CAST(d{i}.dang AS DOUBLE) / CAST(nn.n AS DOUBLE))"
             )} AS rank
      FROM {prev} b
      LEFT JOIN c{i} ON b.node = c{i}.node
      CROSS JOIN d{i} CROSS JOIN nn
    )""")
        prev = f"r{i}"
    return f"""
    -- MATERIALIZED throughout: DuckDB inlines plain CTEs, and each
    -- iteration references its predecessor 3x — unrolled, that is 3^5
    -- copies of the whole pipeline (measured: >23 GB of spill at sf0.1
    -- before filling the disk). Materialization makes the unroll linear.
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    base AS (
      SELECT node, deg.d FROM nodes LEFT JOIN deg ON nodes.node = deg.src
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, d, {r12('1.0 / CAST(nn.n AS DOUBLE)')} AS rank
      FROM base CROSS JOIN nn
    ),{",".join(its)}
    SELECT node, {oracle_dround(f'CAST({prev}.rank AS DOUBLE)', 6)} AS rank
    FROM {prev}
    """


@register("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→customer shipment graph (distinct
    (l_suppkey, o_custkey) pairs; customer ids offset into their own
    node namespace), 5 synchronous iterations at d = 0.85 with uniform
    dangling-mass redistribution — every customer node is dangling, so
    the teleport+dangling path is exercised on most of the mass. The
    oracle unrolls all five iterations in chained CTEs replaying the
    identical 1e-12 DECIMAL rounding."""
    from databricks_demo_feature_store_spark.operators.graph import pagerank

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + F.lit(1000000)).alias("dst"),
    )
    return pagerank(edges, iterations=5, damping=0.85)


def _zorder_oracle(bits: int = 6) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((((p_size >> {j}) & 1)) << {j * 2})")
        terms.append(f"((((p_partkey % 64) >> {j}) & 1) << {j * 2 + 1})")
    z = " | ".join(terms)
    return f"""
    SELECT p_partkey, CAST({z} AS BIGINT) AS zkey
    FROM part
    """


@register("q_zorder_key", oracle=_zorder_oracle())
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton / Z-order clustering key over (p_size, p_partkey mod 64) at
    6 bits per dimension — the space-filling-curve key behind
    OPTIMIZE-ZORDER-style multi-column file clustering
    (`operators/layout.py cluster_by_zorder` range-partitions and sorts
    on it). Pure shift/and/or column algebra; the oracle replays every
    bit placement."""
    from databricks_demo_feature_store_spark.operators.layout import zorder_key

    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        zorder_key(
            [F.col("p_size"), F.pmod(F.col("p_partkey"), F.lit(64))], bits=6
        ).alias("zkey"),
    )


@register(
    "q_frequent_pairs",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it FROM lineitem
    ),
    nb AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
    sup AS (
      SELECT it, COUNT(*) AS n_item FROM b GROUP BY it
      HAVING COUNT(*) >= 25
    ),
    pruned AS (SELECT b.bk, b.it FROM b JOIN sup ON b.it = sup.it),
    pairs AS (
      SELECT l.it AS item_a, r.it AS item_b, COUNT(*) AS n_pair
      FROM pruned l JOIN pruned r ON l.bk = r.bk AND l.it < r.it
      GROUP BY l.it, r.it
      HAVING COUNT(*) >= 25
    )
    SELECT item_a, item_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(sa.n_item AS BIGINT) AS n_a,
           CAST(sb.n_item AS BIGINT) AS n_b,
           CAST(ROUND(CAST(CAST(n_pair AS DOUBLE) / nb.n
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS support,
           CAST(ROUND(CAST(CAST(n_pair AS DOUBLE) / sa.n_item
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS confidence,
           CAST(ROUND(CAST(CAST(n_pair AS DOUBLE) * nb.n
                / (CAST(sa.n_item AS DOUBLE) * sb.n_item)
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS lift
    FROM pairs
    JOIN sup sa ON pairs.item_a = sa.it
    JOIN sup sb ON pairs.item_b = sb.it
    CROSS JOIN nb
    """,
)
def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent supplier pairs across orders (A-priori-pruned
    market-basket co-occurrence): pairs of suppliers that ship in the
    same order at least 25 times, with support / confidence / lift. The
    oracle replays the prune, the basket self-join, and the margin
    arithmetic."""
    from databricks_demo_feature_store_spark.operators.association import (
        frequent_pairs,
    )

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return frequent_pairs(
        l, "l_orderkey", "l_suppkey", min_support_count=25
    )


@register(
    "q_triangle_count",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it FROM lineitem
    ),
    und AS (
      SELECT l.it AS u, r.it AS v
      FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
      GROUP BY l.it, r.it HAVING COUNT(*) >= 25
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
                  THEN und.u ELSE und.v END AS a,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
                  THEN und.v ELSE und.u END AS b
      FROM und
      JOIN deg du ON und.u = du.node
      JOIN deg dv ON und.v = dv.node
    ),
    wedges AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM oriented e1 JOIN oriented e2
        ON e1.a = e2.a AND e1.b < e2.b
    ),
    closing AS (
      SELECT LEAST(a, b) AS x, GREATEST(a, b) AS y FROM oriented
    ),
    tri AS (
      SELECT w.a, w.b, w.c FROM wedges w
      WHERE EXISTS (SELECT 1 FROM closing WHERE x = w.b AND y = w.c)
    ),
    corners AS (
      SELECT node, COUNT(*) AS n FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT deg.node, CAST(COALESCE(corners.n, 0) AS BIGINT) AS n_triangles
    FROM deg LEFT JOIN corners ON deg.node = corners.node
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the frequent-supplier-pair graph
    (suppliers co-shipping in >= 25 orders) via degree-ordered
    orientation — wedge join bounded at O(m^1.5), each triangle
    confirmed once. The oracle replays the edge build, the orientation,
    and the wedge/closing joins."""
    from databricks_demo_feature_store_spark.operators.association import (
        frequent_pairs,
    )
    from databricks_demo_feature_store_spark.operators.graph import triangle_count

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = frequent_pairs(
        l, "l_orderkey", "l_suppkey", min_support_count=25
    ).select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    return triangle_count(edges)


@register(
    "q_clustering_coeff",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it FROM lineitem
    ),
    und AS (
      SELECT l.it AS u, r.it AS v
      FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
      GROUP BY l.it, r.it HAVING COUNT(*) >= 25
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
                  THEN und.u ELSE und.v END AS a,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
                  THEN und.v ELSE und.u END AS b
      FROM und
      JOIN deg du ON und.u = du.node
      JOIN deg dv ON und.v = dv.node
    ),
    wedges AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM oriented e1 JOIN oriented e2
        ON e1.a = e2.a AND e1.b < e2.b
    ),
    closing AS (
      SELECT LEAST(a, b) AS x, GREATEST(a, b) AS y FROM oriented
    ),
    tri AS (
      SELECT w.a, w.b, w.c FROM wedges w
      WHERE EXISTS (SELECT 1 FROM closing WHERE x = w.b AND y = w.c)
    ),
    corners AS (
      SELECT node, COUNT(*) AS n FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT deg.node,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(corners.n, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.d >= 2 THEN
             CAST(ROUND(CAST(
               2.0 * COALESCE(corners.n, 0)
                 / (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1.0))
               AS DECIMAL(38,10)), 6) AS DOUBLE)
           END AS clustering_coeff
    FROM deg LEFT JOIN corners ON deg.node = corners.node
    """,
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node over the
    frequent-supplier-pair graph: ``2·T(v) / (d(v)·(d(v)−1))`` on top of
    the oriented-wedge triangle count, NULL (undefined) for degree-1
    nodes. The oracle replays the edge build, orientation, wedge close,
    degree join, and the one exact IEEE division."""
    from databricks_demo_feature_store_spark.operators.association import (
        frequent_pairs,
    )
    from databricks_demo_feature_store_spark.operators.graph import (
        clustering_coefficient,
    )

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = frequent_pairs(
        l, "l_orderkey", "l_suppkey", min_support_count=25
    ).select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    return clustering_coefficient(edges)


@register(
    "q_name_linkage",
    oracle="""
    WITH names AS (
      SELECT regexp_replace(trim(lower(p_name)), '\\s+', ' ', 'g') AS nm,
             COUNT(*) AS n
      FROM part GROUP BY 1
    ),
    k AS (
      SELECT nm, n, substr(nm, 1, 3) AS blk, len(nm) AS ln FROM names
      WHERE nm IS NOT NULL AND nm <> ''
    ),
    cand AS (
      SELECT a.nm AS name_a, b.nm AS name_b,
             levenshtein(a.nm, b.nm) AS distance,
             GREATEST(a.ln, b.ln) AS mx, a.n AS n_a, b.n AS n_b
      FROM k a JOIN k b
        ON a.blk = b.blk AND a.nm < b.nm AND abs(a.ln - b.ln) <= 3
    )
    SELECT name_a, name_b, CAST(distance AS INT) AS distance,
           CAST(ROUND(CAST(1.0 - CAST(distance AS DOUBLE) / mx
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS similarity,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM cand WHERE distance <= 3
    """,
)
def q_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name linkage over part names: distinct normalized
    names, 3-char prefix blocks, edit distance <= 3 with the
    length-difference lower-bound prune — the entity-resolution
    candidate generator. The oracle replays the normalization, the
    block join, and the exact Levenshtein scoring."""
    from databricks_demo_feature_store_spark.operators.linkage import name_linkage

    p = load(spark, sf_dir, "part")
    return name_linkage(p, "p_partkey", "p_name", prefix_len=3, max_distance=3)


@register(
    "q_grouping_sets",
    oracle="""
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(GROUPING(event_type, CAST(ts AS DATE)) AS INT) AS grouping_level,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS aggregation — per-type totals, per-day
    totals, and the grand total in ONE Expand + hash aggregate (neither
    a rollup nor a cube: the (type, day) cross level is deliberately NOT
    computed). grouping_id disambiguates subtotal NULLs; the day is
    yyyy-MM-dd text so subtotal NULLs survive dtype coercion on both
    engines; the DECIMAL-routed sum keeps every level bit-identical."""
    from databricks_demo_feature_store_spark.operators.aggregation import (
        grouping_sets_agg,
    )

    ev = (
        load(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .withColumn("value_dec", F.col("value").cast("decimal(25,6)"))
    )
    out = grouping_sets_agg(
        ev,
        [["event_type"], ["day"], []],
        [
            {"column": "*", "operation": "count", "alias": "n_events"},
            {"column": "value_dec", "operation": "sum", "alias": "sum_value"},
        ],
        grouping_id_col="grouping_level",
    )
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "grouping_level",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "q_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS entity,
             CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                            DATE '2001-09-01') AS INTEGER) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS m
      FROM orders
      GROUP BY o_custkey
    ),
    s AS (
      SELECT entity, recency_days, frequency, m,
             NTILE(5) OVER (ORDER BY recency_days ASC, entity ASC) AS rbin,
             NTILE(5) OVER (ORDER BY frequency ASC, entity ASC) AS f_score,
             NTILE(5) OVER (ORDER BY m ASC, entity ASC) AS m_score
      FROM base
    )
    SELECT entity AS o_custkey,
           recency_days,
           frequency,
           CAST(m AS DOUBLE) AS monetary,
           CAST(6 - rbin AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST((6 - rbin) * 100 + f_score * 10 + m_score AS INT) AS rfm_code
    FROM s
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: one hash agg collapses the
    fact table to (recency, frequency, DECIMAL-exact monetary) per
    customer, then three distributed-global-rank ntile scores 1..5 (ties
    broken on the customer key) compose rfm_code. Recency is reversed so
    5 = most recent on every axis. The oracle replays the as-of
    date-diff, the exact decimal sum, and all three NTILE assignments.
    Reference parity: the classic customer-value feature block the
    reference's feature pipelines feed to churn models (cf.
    src/packages/feature_generation/feature_operations.py aggregation +
    binning steps)."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        rfm_segments,
    )

    o = load(spark, sf_dir, "orders")
    return rfm_segments(
        o, "o_custkey", "o_orderdate", "o_totalprice", "2001-09-01", n_bins=5
    )


@register(
    "q_golden_records",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT p_partkey AS id,
             regexp_replace(trim(lower(p_name)), '\\s+', ' ', 'g') AS nm,
             p_brand, p_type, p_size, p_retailprice
      FROM part
    ),
    named AS (SELECT * FROM names WHERE nm IS NOT NULL AND nm <> ''),
    k AS (SELECT DISTINCT nm, substr(nm, 1, 3) AS blk, len(nm) AS ln FROM named),
    cand AS (
      SELECT a.nm AS na, b.nm AS nb FROM k a JOIN k b
        ON a.blk = b.blk AND a.nm < b.nm AND abs(a.ln - b.ln) <= 3
      WHERE levenshtein(a.nm, b.nm) <= 3
    ),
    edges AS (SELECT na AS src, nb AS dst FROM cand
              UNION SELECT nb, na FROM cand),
    reach(a, b) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (
      SELECT k.nm, LEAST(k.nm, COALESCE(MIN(r.b), k.nm)) AS comp
      FROM k LEFT JOIN reach r ON r.a = k.nm GROUP BY k.nm
    ),
    ent AS (
      SELECT n.id, n.nm, c.comp, n.p_brand, n.p_type, n.p_size, n.p_retailprice
      FROM named n JOIN comp c ON n.nm = c.nm
    ),
    base AS (
      SELECT comp, MIN(id) AS cluster_id, COUNT(*) AS n_members,
             MAX(p_brand) AS p_brand, MIN(p_size) AS p_size,
             MAX(p_retailprice) AS p_retailprice
      FROM ent GROUP BY comp
    ),
    canon AS (
      SELECT comp, nm AS canonical_name, p_type FROM (
        SELECT comp, nm, p_type,
               ROW_NUMBER() OVER (PARTITION BY comp
                                  ORDER BY len(nm) DESC, nm DESC) AS rn_name
        FROM ent) WHERE rn_name = 1
    ),
    tlong AS (
      SELECT comp, p_type FROM (
        SELECT comp, p_type,
               ROW_NUMBER() OVER (PARTITION BY comp
                                  ORDER BY len(p_type) DESC, p_type DESC) AS rn
        FROM ent) WHERE rn = 1
    )
    SELECT b.cluster_id,
           CAST(b.n_members AS BIGINT) AS n_members,
           c.canonical_name,
           b.p_brand,
           CAST(b.p_size AS INT) AS p_size,
           b.p_retailprice,
           t.p_type
    FROM base b JOIN canon c USING (comp) JOIN tlong t USING (comp)
    """,
)
def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end over part names: fuzzy linkage
    (3-char blocks, <=3 edits) → connected components over DISTINCT
    normalized names (never entity-id pair expansion) → one golden
    record per cluster with field survivorship (max brand/price, min
    size, longest type, longest name as canonical). The oracle replays
    normalization, the blocked Levenshtein pairs, the transitive
    closure, and every survivorship pick."""
    from databricks_demo_feature_store_spark.operators.linkage import golden_records

    p = load(spark, sf_dir, "part")
    return golden_records(
        p,
        "p_partkey",
        "p_name",
        {
            "p_brand": "max",
            "p_size": "min",
            "p_retailprice": "max",
            "p_type": "longest",
        },
    )


def _cms_oracle(depth: int = 4, width: int = 64) -> str:
    def h(i):
        return (
            f"CAST(concat('0x', substr(md5(concat('0:{i}:', "
            f"CAST(l_suppkey AS VARCHAR))), 1, 15)) AS BIGINT) % {width}"
        )

    cell_union = "\n      UNION ALL ".join(
        f"SELECT l_suppkey, {i} AS row_idx, CAST({h(i)} AS INT) AS bucket FROM src"
        for i in range(depth)
    )
    return f"""
    WITH src AS (
      SELECT l_suppkey FROM lineitem WHERE l_suppkey IS NOT NULL
    ),
    hashed AS (
      {cell_union}
    ),
    cells AS (
      SELECT row_idx, bucket, COUNT(*) AS n FROM hashed GROUP BY 1, 2
    ),
    exact AS (
      SELECT l_suppkey, COUNT(*) AS exact_count FROM src GROUP BY 1
    ),
    probes AS (
      SELECT DISTINCT l_suppkey, row_idx, bucket FROM hashed
    ),
    est AS (
      SELECT p.l_suppkey, MIN(COALESCE(c.n, 0)) AS cms_count
      FROM probes p LEFT JOIN cells c USING (row_idx, bucket)
      GROUP BY p.l_suppkey
    )
    SELECT e.l_suppkey,
           CAST(x.exact_count AS BIGINT) AS exact_count,
           CAST(e.cms_count AS BIGINT) AS cms_count,
           e.cms_count >= x.exact_count AS is_overestimate
    FROM est e JOIN exact x USING (l_suppkey)
    """


@register("q_cms_frequencies", oracle=_cms_oracle())
def q_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation, self-audited: a 4×64
    sketch of supplier frequencies (deliberately narrow so collisions
    actually occur), point-queried for every supplier and joined to the
    exact counts — the is_overestimate column certifies the CMS
    one-sided-error guarantee on every key. The sketch is ≤ depth·width
    rows however big the fact table gets; estimates probe it with a
    broadcast join. The oracle replays the hash cells, the min-read,
    and the exact counts."""
    from databricks_demo_feature_store_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    li = load(spark, sf_dir, "lineitem").select("l_suppkey")
    sk = count_min_sketch(li, "l_suppkey", depth=4, width=64)
    # exact counts double as the distinct key list: probing the broadcast
    # cell map per exact row removes the old distinct + probe-explode +
    # min-regroup + est⋈exact join (guide §2.4 — one exchange total; the
    # row set is identical because GROUP BY keys ARE the distinct keys)
    exact = (
        li.where(F.col("l_suppkey").isNotNull())
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return cms_estimate(sk, exact, "l_suppkey", depth=4, width=64).select(
        "l_suppkey",
        F.col("exact_count").cast("long").alias("exact_count"),
        "cms_count",
        (F.col("cms_count") >= F.col("exact_count")).alias("is_overestimate"),
    )


@register(
    "q_name_linkage_multiblock",
    oracle="""
    WITH names AS (
      SELECT regexp_replace(trim(lower(p_name)), '\\s+', ' ', 'g') AS nm,
             COUNT(*) AS n
      FROM part GROUP BY 1
    ),
    k AS (
      SELECT nm, n, substr(nm, 1, 3) AS blk,
             substr(reverse(nm), 1, 3) AS rblk, len(nm) AS ln
      FROM names WHERE nm IS NOT NULL AND nm <> ''
    ),
    cand AS (
      SELECT a.nm AS name_a, b.nm AS name_b,
             GREATEST(a.ln, b.ln) AS mx, a.n AS n_a, b.n AS n_b
      FROM k a JOIN k b
        ON a.blk = b.blk AND a.nm < b.nm AND abs(a.ln - b.ln) <= 3
      UNION
      SELECT a.nm, b.nm, GREATEST(a.ln, b.ln), a.n, b.n
      FROM k a JOIN k b
        ON a.rblk = b.rblk AND a.nm < b.nm AND abs(a.ln - b.ln) <= 3
    ),
    scored AS (
      SELECT name_a, name_b, levenshtein(name_a, name_b) AS distance,
             mx, n_a, n_b
      FROM cand
    )
    SELECT name_a, name_b, CAST(distance AS INT) AS distance,
           CAST(ROUND(CAST(1.0 - CAST(distance AS DOUBLE) / mx
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS similarity,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM scored WHERE distance <= 3
    """,
)
def q_name_linkage_multiblock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass blocked fuzzy linkage: the prefix block PLUS the
    reversed-name-prefix block (the standard recall fix for
    first-character typos that single-prefix blocking structurally
    misses) — candidate pairs union with a distinct, each pass stays an
    equi-join over the distinct-name frame. The oracle replays both
    block joins, the union, and the exact Levenshtein scoring."""
    from databricks_demo_feature_store_spark.operators.linkage import name_linkage

    p = load(spark, sf_dir, "part")
    return name_linkage(
        p, "p_partkey", "p_name", prefix_len=3, max_distance=3,
        blocks=("prefix", "rev_prefix"),
    )


@register(
    "q_json_extract",
    oracle="""
    WITH ex AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
           CAST(ROUND(CAST(AVG(k) AS DECIMAL(38,10)), 6) AS DOUBLE) AS avg_k
    FROM ex GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction feeding an aggregate: props.k pulled as an
    int (pure projection — no shuffle, no Python, NULL on missing or
    malformed), then per-event-type counts and mean. The oracle replays
    the JSON path extraction and the arithmetic."""
    from databricks_demo_feature_store_spark.functions.semistructured import (
        json_extract_typed,
    )
    from databricks_demo_feature_store_spark.functions.rounding import dround

    ev = load(spark, sf_dir, "events").select("event_type", "props")
    ex = json_extract_typed(ev, "props", {"k": "int"})
    return ex.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("k").isNotNull().cast("long")).cast("long").alias("n_with_k"),
        dround(F.avg("k"), 6).alias("avg_k"),
    )


@register(
    "q_json_key_profile",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS t FROM events),
    k AS (
      SELECT unnest(json_keys(props)) AS key FROM events
      WHERE props IS NOT NULL AND json_valid(props)
    ),
    c AS (SELECT key, COUNT(*) AS n_present FROM k GROUP BY key)
    SELECT key,
           CAST(n_present AS BIGINT) AS n_present,
           CAST(ROUND(CAST(CAST(n_present AS DOUBLE) / tot.t
                AS DECIMAL(38,10)), 6) AS DOUBLE) AS present_share
    FROM c CROSS JOIN tot
    """,
)
def q_json_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON key discovery over the raw event payloads: one row per
    top-level key with its presence count and share over all rows —
    the profile that drives extraction configs. One explode + one hash
    agg, output bounded by distinct keys. The oracle replays key
    enumeration and the share arithmetic."""
    from databricks_demo_feature_store_spark.functions.semistructured import (
        json_key_profile,
    )

    ev = load(spark, sf_dir, "events").select("props")
    return json_key_profile(ev, "props")


@register(
    "q_json_schema_drift",
    oracle="""
    WITH ref0 AS (
      SELECT CASE WHEN event_id % 5 = 0
                  THEN concat(substr(props, 1, len(props) - 1), ', "old": 2}')
                  ELSE props END AS props
      FROM events
    ),
    cur0 AS (
      SELECT CASE WHEN event_id % 4 = 0 THEN '{"z": 1}' ELSE props END AS props
      FROM events
    ),
    rt AS (SELECT COUNT(*) AS t FROM ref0),
    ct AS (SELECT COUNT(*) AS t FROM cur0),
    rk AS (
      SELECT key, COUNT(*) AS n FROM (
        SELECT unnest(json_keys(props)) AS key FROM ref0
        WHERE props IS NOT NULL AND json_valid(props)
      ) GROUP BY key
    ),
    ck AS (
      SELECT key, COUNT(*) AS n FROM (
        SELECT unnest(json_keys(props)) AS key FROM cur0
        WHERE props IS NOT NULL AND json_valid(props)
      ) GROUP BY key
    ),
    j AS (
      SELECT COALESCE(ck.key, rk.key) AS key, ck.n AS n_cur, rk.n AS n_ref
      FROM ck FULL OUTER JOIN rk ON ck.key = rk.key
    ),
    shares AS (
      SELECT key,
             CAST(ROUND(CAST(COALESCE(CAST(n_cur AS DOUBLE) / ct.t, 0)
                  AS DECIMAL(38,10)), 6) AS DOUBLE) AS cur_share,
             CAST(ROUND(CAST(COALESCE(CAST(n_ref AS DOUBLE) / rt.t, 0)
                  AS DECIMAL(38,10)), 6) AS DOUBLE) AS ref_share,
             n_cur, n_ref
      FROM j CROSS JOIN rt CROSS JOIN ct
    )
    SELECT key, cur_share, ref_share,
           CAST(ROUND(CAST(cur_share - ref_share AS DECIMAL(38,10)), 6)
                AS DOUBLE) AS share_delta,
           CASE WHEN n_ref IS NULL THEN 'added'
                WHEN n_cur IS NULL THEN 'removed'
                ELSE 'present' END AS status
    FROM shares
    """,
)
def q_json_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload schema drift between two event snapshots: the reference
    side carries a legacy key on every 5th event (string-surgery twin on
    both engines), the current side replaces every 4th payload with a
    new-producer shape — the audit must report the legacy key as
    removed, the new key as added, and the shared key's presence-share
    delta. All arithmetic on key-bounded frames; the oracle replays the
    synthetic versions, the key profiles, and the full-outer diff."""
    from databricks_demo_feature_store_spark.functions.semistructured import (
        json_schema_drift,
    )

    ev = load(spark, sf_dir, "events").select("event_id", "props")
    ref = ev.select(
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(
                F.expr("substring(props, 1, length(props) - 1)"),
                F.lit(', "old": 2}'),
            ),
        ).otherwise(F.col("props")).alias("props")
    )
    cur = ev.select(
        F.when(F.col("event_id") % 4 == 0, F.lit('{"z": 1}'))
        .otherwise(F.col("props"))
        .alias("props")
    )
    return json_schema_drift(cur, ref, "props")


@register(
    "q_purged_folds",
    oracle="""
    WITH folds(f, cut) AS (
      VALUES (0, TIMESTAMP '1996-01-01 00:00:00'),
             (1, TIMESTAMP '1997-01-01 00:00:00')
    ),
    long AS (
      SELECT o.o_orderkey, f.f AS fold,
             CASE
               WHEN o.o_orderdate <= f.cut - INTERVAL 30 DAY THEN 'train'
               WHEN o.o_orderdate > f.cut + INTERVAL 7 DAY
                AND o.o_orderdate <= f.cut + INTERVAL 90 DAY THEN 'test'
             END AS split
      FROM orders o CROSS JOIN folds f
    )
    SELECT CAST(fold AS INT) AS fold, split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM long WHERE split IS NOT NULL
    GROUP BY fold, split
    """,
)
def q_purged_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged + embargoed CV folds: 30-day label horizons are purged
    from the train side (a label window crossing the cutoff peeks into
    the test period) and a 7-day embargo trims the test side — the
    leakage-safe split for forward-horizon labels. Gate compares
    per-(fold, split) counts and key ranges; literal cutoffs, pure range
    predicates, no shuffle."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        purged_backtest_folds,
    )

    o = load(spark, sf_dir, "orders")
    long = purged_backtest_folds(
        o, "o_orderdate", ["1996-01-01", "1997-01-01"],
        horizon_days=90, label_horizon_days=30, embargo_days=7,
    )
    return long.groupBy("fold", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


@register(
    "q_position_attribution",
    oracle="""
    WITH typed AS (
      SELECT user_id,
             COALESCE(CAST(event_type AS VARCHAR), '__null__') AS channel,
             COALESCE(event_type = 'purchase', FALSE) AS is_conv,
             ts, event_id, value
      FROM events
    ),
    t AS (
      SELECT user_id, channel, ts, event_id, is_conv,
             LAST_VALUE(CASE WHEN is_conv THEN event_id END IGNORE NULLS)
               OVER w AS cid,
             LAST_VALUE(CASE WHEN is_conv THEN value END IGNORE NULLS)
               OVER w AS cval
      FROM typed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    touch AS (
      SELECT user_id, channel, ts, event_id, cid, cval
      FROM t WHERE NOT is_conv AND cid IS NOT NULL
    ),
    ranked AS (
      SELECT channel, cval,
             COUNT(*) OVER (PARTITION BY user_id, cid) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id, cid
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM touch
    ),
    credited AS (
      SELECT channel,
             CAST(ROUND(CAST(
               (CASE WHEN n = 1 THEN 1.0
                     WHEN n = 2 THEN 0.5
                     WHEN rn = 1 THEN 0.4
                     WHEN rn = n THEN 0.4
                     ELSE (1.0 - 0.4 - 0.4) / (n - 2) END) * cval
               AS DECIMAL(38,10)), 9) AS DOUBLE) AS credit
      FROM ranked
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CAST(credit AS DECIMAL(25,9))) AS DOUBLE) AS credited_value
    FROM credited GROUP BY channel
    """,
)
def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution over the event stream: each
    purchase's value splits 40/20/40 across the touch run since the
    user's previous purchase (single touch 1.0, pair 50/50), rolled up
    per channel. One descending carry window + one run-ranking window +
    one hash agg; credit terms round at 9 decimals and sum as DECIMAL so
    the totals are order-independent. The oracle replays the carry, the
    run ranking, the weight CASE and the exact sum."""
    from databricks_demo_feature_store_spark.operators.events import (
        position_attribution,
    )

    ev = load(spark, sf_dir, "events")
    return position_attribution(ev, "purchase")


@register(
    "q_conversion_lags",
    oracle="""
    WITH typed AS (
      SELECT user_id,
             COALESCE(CAST(event_type AS VARCHAR), '__null__') AS channel,
             COALESCE(event_type = 'purchase', FALSE) AS is_conv,
             ts, event_id
      FROM events
    ),
    t AS (
      SELECT user_id, channel, ts, event_id, is_conv,
             LAST_VALUE(CASE WHEN is_conv THEN event_id END IGNORE NULLS)
               OVER w AS cid,
             LAST_VALUE(CASE WHEN is_conv THEN ts END IGNORE NULLS)
               OVER w AS cts
      FROM typed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    touch AS (
      SELECT user_id, channel, ts, event_id, cid, cts
      FROM t WHERE NOT is_conv AND cid IS NOT NULL
    ),
    firsts AS (
      SELECT user_id, cid,
             MIN(struct_pack(ts := ts, event_id := event_id, channel := channel)) AS fst,
             MAX(cts) AS cts
      FROM touch GROUP BY user_id, cid
    ),
    lags AS (
      SELECT (fst).channel AS channel,
             CAST(epoch_us(cts) - epoch_us((fst).ts) AS DOUBLE)
               / 1000000.0 AS lag
      FROM firsts
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(ROUND(CAST(quantile_cont(lag, 0.5) AS DECIMAL(38,10)), 6)
                AS DOUBLE) AS median_lag_sec,
           CAST(ROUND(CAST(quantile_cont(lag, 0.9) AS DECIMAL(38,10)), 6)
                AS DOUBLE) AS p90_lag_sec
    FROM lags GROUP BY channel
    """,
)
def q_conversion_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion latency per first-touch channel: lag from the
    first touch of each purchase's run to the purchase, exact median and
    p90 per channel — one carry window, one map-combined (user,
    conversion) min-struct aggregation, one grouped exact percentile.
    The oracle replays the carry, the struct-min first-touch pick and
    the percentiles."""
    from databricks_demo_feature_store_spark.operators.events import (
        conversion_lag_stats,
    )

    ev = load(spark, sf_dir, "events")
    return conversion_lag_stats(ev, "purchase")


@register(
    "q_cdc_apply_changes",
    oracle="""
    WITH changes AS (
      SELECT o_custkey AS c_custkey, o_orderkey AS seq,
             CASE WHEN o_orderkey % 20 = 0 THEN 'D' ELSE 'U' END AS op,
             concat('cust_', CAST(o_orderkey AS VARCHAR)) AS c_name,
             CAST(o_orderkey % 25 AS INT) AS c_nationkey,
             o_totalprice AS c_acctbal,
             o_orderpriority AS c_mktsegment
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_custkey + 1000000, o_orderkey, 'U',
             concat('new_', CAST(o_custkey AS VARCHAR)),
             CAST(o_orderkey % 25 AS INT), o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 3
    ),
    final AS (
      SELECT * FROM (
        SELECT c_custkey, op, c_name, c_nationkey, c_acctbal, c_mktsegment,
               ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    )
    SELECT s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal, s.c_mktsegment
    FROM customer s ANTI JOIN final f ON s.c_custkey = f.c_custkey
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM final WHERE op <> 'D'
    """,
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply-changes: a sequence-ordered change stream (updates,
    deletes, inserts of brand-new keys — synthesized deterministically
    from the orders table) folds into the customer snapshot; per key only
    the HIGHEST-sequence change applies ("apply changes into" semantics).
    One max_by hash agg picks final changes (map-side combine, no per-key
    sort), one anti-join + union splices the snapshot. The oracle replays
    the fold with ROW_NUMBER + anti join."""
    from databricks_demo_feature_store_spark.operators.cdc import apply_changes

    snapshot = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    upd = o.where(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 20 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("cust_"), F.col("o_orderkey").cast("string")).alias("c_name"),
        (F.col("o_orderkey") % 25).cast("int").alias("c_nationkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    ins = o.where(F.col("o_orderkey") % 7 == 3).select(
        (F.col("o_custkey") + 1000000).alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("new_"), F.col("o_custkey").cast("string")).alias("c_name"),
        (F.col("o_orderkey") % 25).cast("int").alias("c_nationkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    return apply_changes(
        snapshot, upd.unionByName(ins), keys=["c_custkey"], sequence_col="seq"
    )


@register(
    "q_asof_nearest",
    oracle="""
    WITH spine AS (
      SELECT event_id, user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS cts, value AS click_value
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT s.event_id, c.cts AS b_ts, c.click_value AS b_val
      FROM spine s ASOF LEFT JOIN clicks c
        ON s.user_id = c.user_id AND s.ts >= c.cts
    ),
    fw AS (
      SELECT s.event_id, c.cts AS f_ts, c.click_value AS f_val
      FROM spine s ASOF LEFT JOIN clicks c
        ON s.user_id = c.user_id AND s.ts <= c.cts
    ),
    tol AS (
      SELECT s.event_id, s.user_id, s.ts, s.purchase_value,
             CASE WHEN b.b_ts IS NOT NULL AND b.b_ts >= s.ts - INTERVAL 2 HOUR
                  THEN b.b_ts END AS b_ts,
             b.b_val,
             CASE WHEN fw.f_ts IS NOT NULL AND fw.f_ts <= s.ts + INTERVAL 2 HOUR
                  THEN fw.f_ts END AS f_ts,
             fw.f_val
      FROM spine s JOIN b USING (event_id) JOIN fw USING (event_id)
    )
    SELECT event_id, user_id, ts, purchase_value,
           CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                WHEN f_ts IS NULL THEN b_val
                WHEN b_ts IS NULL THEN f_val
                WHEN (ts - b_ts) <= (f_ts - ts) THEN b_val
                ELSE f_val END AS click_value,
           CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                WHEN f_ts IS NULL THEN b_ts
                WHEN b_ts IS NULL THEN f_ts
                WHEN (ts - b_ts) <= (f_ts - ts) THEN b_ts
                ELSE f_ts END AS click_ts
    FROM tol
    """,
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction-aware as-of join, NEAREST mode with a 2-hour tolerance:
    each purchase matches its closest click (before or after) by the same
    user; exact ties resolve backward; an out-of-tolerance side never
    shadows an in-tolerance one. Both carries ride ONE union + ONE
    exchange (two window sorts share the hash partitioning). The oracle
    cross-checks with two DuckDB ASOF joins + the same nearest/tolerance
    CASE fold."""
    from databricks_demo_feature_store_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    spine = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("click_value")
    )
    return asof_join(
        spine,
        clicks,
        keys=["user_id"],
        spine_time="ts",
        feature_time="cts",
        direction="nearest",
        tolerance_expr="INTERVAL 2 HOURS",
        matched_time_col="click_ts",
    )


@register(
    "q_scd2_dim_join",
    oracle="""
    WITH snaps AS (
      SELECT user_id, CAST(ts AS DATE) AS snap_day,
             MAX(event_type) AS state
      FROM events GROUP BY 1, 2
    ),
    flagged AS (
      SELECT user_id, snap_day, state,
             CASE WHEN LAG(snap_day) OVER w IS NULL
                  OR state IS DISTINCT FROM LAG(state) OVER w
                  THEN 1 ELSE 0 END AS new_run
      FROM snaps
      WINDOW w AS (PARTITION BY user_id ORDER BY snap_day ASC)
    ),
    runs AS (
      SELECT user_id, snap_day, state,
             SUM(new_run) OVER (PARTITION BY user_id ORDER BY snap_day ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM flagged
    ),
    per_run AS (
      SELECT user_id, run, MIN(snap_day) AS effective_from,
             MIN(state) AS state
      FROM runs GROUP BY 1, 2
    ),
    intervals AS (
      SELECT user_id, state,
             CAST(effective_from AS TIMESTAMP) AS vf,
             CAST(LEAD(effective_from) OVER (PARTITION BY user_id ORDER BY effective_from ASC) AS TIMESTAMP) AS vt
      FROM per_run
    ),
    facts AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts, f.value,
           CASE WHEN i.vt IS NOT NULL AND f.ts >= i.vt THEN NULL
                ELSE i.state END AS state
    FROM facts f ASOF LEFT JOIN intervals i
      ON f.user_id = i.user_id AND f.ts >= i.vf
    """,
)
def q_scd2_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal fact⋈SCD2-dimension join: purchases attach the per-user
    state VERSION active at their instant (dimension built by build_scd2
    over daily state snapshots — the q_scd2_intervals machinery); facts
    before a user's first version keep NULL state. Rides the linear
    as-of carry on effective_from with the effective_to residual applied
    row-locally — per-key version history never multiplies the fact
    side. The oracle replays the interval build and cross-checks with a
    DuckDB ASOF join + expiry CASE."""
    from databricks_demo_feature_store_spark.operators.history import build_scd2
    from databricks_demo_feature_store_spark.operators.joins import scd2_dim_join

    ev = load(spark, sf_dir, "events")
    snaps = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("snap_day")
    ).agg(F.max("event_type").alias("state"))
    dim = build_scd2(snaps, ["user_id"], ["state"], "snap_day")
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return scd2_dim_join(
        facts, dim, keys=["user_id"], fact_time="ts",
        valid_from="effective_from", valid_to="effective_to",
        dim_cols=["state"],
    )


@register(
    "q_trailing_features",
    oracle="""
    WITH spine AS (
      SELECT o_orderkey AS label_id, o_custkey AS custkey,
             o_orderdate AS label_ts
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT s.custkey, s.label_id, s.label_ts,
           CAST(COALESCE(SUM(CAST(e.o_totalprice AS DECIMAL(25,2))), 0)
                AS DOUBLE) AS spend_90d,
           COUNT(e.o_orderkey) AS orders_90d
    FROM spine s LEFT JOIN orders e
      ON e.o_custkey = s.custkey
     AND e.o_orderdate >= s.label_ts - INTERVAL 90 DAY
     AND e.o_orderdate <  s.label_ts
    GROUP BY s.custkey, s.label_id, s.label_ts
    """,
)
def q_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window aggregate features at arbitrary label timestamps:
    per spine row (every 5th order), the customer's exact trailing-90-day
    spend and order count STRICTLY BEFORE the label instant (half-open
    window — the leakage-safe convention; the label order itself never
    counts). Prefix-sum + two exclusive as-of anchor carries in ONE
    shuffle — linear in events regardless of window length or per-key
    density, where the oracle's theta join multiplies every spine row by
    its trailing events (fine at sf0.01, dead at 100 TB)."""
    from databricks_demo_feature_store_spark.operators.windows import (
        trailing_window_features,
    )

    o = load(spark, sf_dir, "orders")
    spine = o.where(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("label_id"),
        F.col("o_orderdate").alias("label_ts"),
    )
    events = o.select(
        F.col("o_custkey").alias("custkey"), "o_orderdate", "o_totalprice"
    )
    return trailing_window_features(
        spine,
        events,
        keys=["custkey"],
        spine_time="label_ts",
        event_time="o_orderdate",
        window_expr="INTERVAL 90 DAYS",
        sum_cols=[("spend_90d", "o_totalprice")],
        count_col="orders_90d",
    )


@register(
    "q_incr_agg_refresh",
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(o_totalprice) AS spend_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS spend_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
             / CAST(COUNT(o_totalprice) AS DOUBLE) AS spend_mean,
           SQRT(GREATEST(
             (CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
              - (CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                 * CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE))
                / CAST(COUNT(o_totalprice) AS DOUBLE))
             / CAST(COUNT(o_totalprice) AS DOUBLE), 0.0)) AS spend_std
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_incr_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-feature maintenance proven equal to full
    recompute: the per-customer spend moments (count / exact DECIMAL sum
    / sum-of-squares) are built from TWO disjoint slices of orders (the
    'stored state' and the 'new day's batch'), cell-sum MERGED, and
    finalized into count/sum/mean/std — and because each moment is a
    commutative monoid the merged state is bit-identical to a single
    full-scan aggregation, which is exactly what the oracle computes.
    At 100 TB the daily refresh touches O(day's data), never history."""
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        aggregate_state,
        finalize_aggregates,
        merge_aggregate_state,
    )

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    hist = o.where(F.col("o_orderkey") % 3 != 0)
    batch = o.where(F.col("o_orderkey") % 3 == 0)
    state = merge_aggregate_state(
        aggregate_state(hist, ["custkey"], "o_totalprice"),
        aggregate_state(batch, ["custkey"], "o_totalprice"),
        keys=["custkey"],
    )
    return finalize_aggregates(state, ["custkey"], prefix="spend")


@register(
    "q_label_window",
    oracle="""
    WITH spine AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'signup'
    ),
    outc AS (
      SELECT user_id, ts AS ot, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT s.event_id, s.user_id, s.ts,
           CAST(COALESCE(SUM(CAST(o.value AS DECIMAL(25,2))), 0)
                AS DOUBLE) AS spend_30d,
           COUNT(o.ot) AS purchases_30d
    FROM spine s LEFT JOIN outc o
      ON o.user_id = s.user_id
     AND o.ot >  s.ts
     AND o.ot <= s.ts + INTERVAL 30 DAY
    GROUP BY s.event_id, s.user_id, s.ts
    """,
)
def q_label_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward outcome-window labels: per signup event, the user's
    purchase spend and count in the NEXT 30 days, window open strictly
    after the decision instant — (t, t+h], the leakage-safe label side
    of a forward-horizon training set. Same prefix-sum + anchor-carry
    core as the trailing features (mirrored to inclusive carries), one
    shuffle, linear in events; the oracle is the theta-join form."""
    from databricks_demo_feature_store_spark.operators.windows import (
        label_window_features,
    )

    ev = load(spark, sf_dir, "events")
    spine = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    outcomes = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ot"), "value"
    )
    return label_window_features(
        spine,
        outcomes,
        keys=["user_id"],
        spine_time="ts",
        event_time="ot",
        horizon_expr="INTERVAL 30 DAYS",
        sum_cols=[("spend_30d", "value")],
        count_col="purchases_30d",
    )


@register(
    "q_trailing_multi_window",
    oracle="""
    WITH spine AS (
      SELECT o_orderkey AS label_id, o_custkey AS custkey,
             o_orderdate AS label_ts
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT s.custkey, s.label_id, s.label_ts,
           CAST(COALESCE(SUM(CASE WHEN e.o_orderdate >= s.label_ts - INTERVAL 30 DAY
                 THEN CAST(e.o_totalprice AS DECIMAL(25,2)) END), 0) AS DOUBLE) AS spend_30d,
           CAST(COALESCE(SUM(CASE WHEN e.o_orderdate >= s.label_ts - INTERVAL 30 DAY
                 AND e.o_orderpriority = '1-URGENT'
                 THEN CAST(e.o_totalprice AS DECIMAL(25,2)) END), 0) AS DOUBLE) AS urgent_spend_30d,
           CAST(COALESCE(SUM(CASE WHEN e.o_orderdate >= s.label_ts - INTERVAL 365 DAY
                 THEN CAST(e.o_totalprice AS DECIMAL(25,2)) END), 0) AS DOUBLE) AS spend_365d,
           CAST(COALESCE(SUM(CASE WHEN e.o_orderdate >= s.label_ts - INTERVAL 365 DAY
                 AND e.o_orderpriority = '1-URGENT'
                 THEN CAST(e.o_totalprice AS DECIMAL(25,2)) END), 0) AS DOUBLE) AS urgent_spend_365d,
           COUNT(CASE WHEN e.o_orderdate >= s.label_ts - INTERVAL 30 DAY THEN 1 END) AS n_30d,
           COUNT(CASE WHEN e.o_orderdate >= s.label_ts - INTERVAL 365 DAY THEN 1 END) AS n_365d
    FROM spine s LEFT JOIN orders e
      ON e.o_custkey = s.custkey
     AND e.o_orderdate >= s.label_ts - INTERVAL 365 DAY
     AND e.o_orderdate <  s.label_ts
    GROUP BY s.custkey, s.label_id, s.label_ts
    """,
)
def q_trailing_multi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N trailing windows × M measures in ONE shuffle: per spine row the
    30-day and 365-day total AND urgent-only spend plus event counts —
    the multi-horizon feature block a real store serves. Each extra
    window adds one anchor row per spine row (spine-sized), never
    another pass over the events; conditional measures ride the same
    DECIMAL prefix sums. The oracle is the single widest range join with
    per-window conditional sums."""
    from databricks_demo_feature_store_spark.operators.windows import (
        trailing_multi_window_features,
    )

    o = load(spark, sf_dir, "orders")
    spine = o.where(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("label_id"),
        F.col("o_orderdate").alias("label_ts"),
    )
    events = o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderdate",
        "o_totalprice",
        "o_orderpriority",
    )
    return trailing_multi_window_features(
        spine,
        events,
        keys=["custkey"],
        spine_time="label_ts",
        event_time="o_orderdate",
        windows=[("30d", "INTERVAL 30 DAYS"), ("365d", "INTERVAL 365 DAYS")],
        sum_cols=[
            ("spend", "o_totalprice"),
            (
                "urgent_spend",
                "CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END",
            ),
        ],
        count_col="n",
    )


@register(
    "q_event_paths",
    oracle="""
    WITH stepped AS (
      SELECT user_id,
             event_type || '>' || LEAD(event_type, 1) OVER w
                        || '>' || LEAD(event_type, 2) OVER w AS path,
             event_type IS NOT NULL
               AND LEAD(event_type, 1) OVER w IS NOT NULL
               AND LEAD(event_type, 2) OVER w IS NOT NULL AS complete
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT path, COUNT(*) AS n_paths, COUNT(DISTINCT user_id) AS n_users
    FROM stepped WHERE complete
    GROUP BY path
    ORDER BY n_paths DESC, path ASC
    LIMIT 20
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-walked 3-step event-type paths — path DISCOVERY, the
    complement of hypothesis-testing funnels: which sequences users
    actually take, with per-path traversal and distinct-walker counts.
    One per-user window sort + hash count + TakeOrdered; the oracle
    replays the lead-concat windows."""
    from databricks_demo_feature_store_spark.operators.events import event_paths

    ev = load(spark, sf_dir, "events")
    return event_paths(ev, depth=3, k=20)


@register(
    "q_event_path_conversion",
    oracle=f"""
    WITH stepped AS (
      SELECT event_type || '>' || LEAD(event_type, 1) OVER w AS path,
             event_type IS NOT NULL
               AND LEAD(event_type, 1) OVER w IS NOT NULL AS complete,
             LEAD(event_type, 2) OVER w AS outcome
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    counted AS (
      SELECT path, COUNT(*) AS n_paths,
             CAST(SUM(CASE WHEN outcome = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_converted
      FROM stepped WHERE complete
      GROUP BY path
    )
    SELECT path, n_paths, n_converted,
           {oracle_dround('CAST(n_converted AS DOUBLE) / CAST(n_paths AS DOUBLE)', 6)}
             AS conversion_rate
    FROM counted
    ORDER BY n_paths DESC, path ASC
    LIMIT 20
    """,
)
def q_event_path_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path → outcome attribution, completing the round-10 path
    discovery: for every 2-step event-type path occurrence, the NEXT
    event decides conversion (= 'purchase') vs abandonment; top-20
    paths by traversal with conversion counts and rates — which
    sequences actually LEAD to the goal. One per-user window sort
    (path leads + outcome lead ride the same sort) + one hash agg +
    TakeOrdered; the oracle replays the lead-concat windows and the
    CASE-summed conversions."""
    from databricks_demo_feature_store_spark.operators.events import path_conversion

    ev = load(spark, sf_dir, "events")
    return path_conversion(ev, target="purchase", depth=2, k=20)


@register(
    "q_skipping_scan",
    oracle=f"""
    SELECT CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS ship_month,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY ship_month
    """,
)
def q_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level min/max data skipping (sources/skipping.py) — the
    Delta data-skipping twin on plain parquet: write lineitem
    range-clustered on l_shipdate, harvest per-file stats with ONE
    distributed footer-only pass, prune the file list against a year
    predicate, scan only the surviving files, and re-apply the full
    predicate as a residual (skipping is an optimization, never a
    semantics change). The oracle runs the same filter+agg over the
    FULL table — equality proves no file that contained matching rows
    was pruned. Pruning effectiveness (files actually skipped) is
    pinned in tests/test_skipping.py.
    """
    import datetime as dt

    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.skipping import (
        harvest_file_stats,
        read_with_skipping,
    )

    root = scratch_dir("skipping")
    path = os.path.join(root, "lineitem_clustered")
    li = load(spark, sf_dir, "lineitem")
    # range-cluster on the skipping column so files carry tight ranges —
    # exactly what an OPTIMIZE ZORDER / clustered ingest produces
    li.repartitionByRange(8, "l_shipdate").write.mode("overwrite").parquet(path)
    stats = harvest_file_stats(spark, path, ["l_shipdate"])
    lo = dt.datetime(1996, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    hi = dt.datetime(1997, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    df, _report = read_with_skipping(
        spark,
        path,
        stats,
        [("l_shipdate", ">=", lo), ("l_shipdate", "<", hi)],
        residual=(
            "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
        ),
    )
    return (
        df.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("ship_month")
    )


@register(
    "q_bloom_join_reduce",
    oracle=f"""
    SELECT o.o_orderpriority,
           {_o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 400000.0 AND o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_bloom_join_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (operators/joins.py
    bloom_filtered_join): a selective filter on orders leaves few keys,
    so a broadcast Bloom of the surviving orderkeys pre-filters
    lineitem BEFORE the shuffle join — the explicit runtime-filter
    pattern. The result is EXACTLY the plain join's (no false
    negatives; false positives die in the exact join), which is what
    the oracle checks; the reduction factor itself is pinned in
    tests/test_skipping.py.
    """
    from databricks_demo_feature_store_spark.operators import bloom_filtered_join

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") > 400000.0) & (F.col("o_orderstatus") == "F")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        # n_bits sized to the selective build side (~1k keys → 2^16 bits
        # ≈ fpp 2e-6); the operator default (2^20) serves ~100k-key builds
        bloom_filtered_join(
            l, o, left_on="l_orderkey", right_on="o_orderkey", n_bits=1 << 16
        )
        .groupBy("o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_skipping_zorder",
    oracle=f"""
    SELECT l_returnflag,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {_o_dsum('l_quantity', 2)} AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 300
      AND l_suppkey BETWEEN 10 AND 40
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_skipping_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column data skipping over a Z-ordered layout — the OPTIMIZE
    ZORDER + data-skipping composition: `cluster_by_zorder` gives every
    file a tight min/max bounding box in BOTH l_partkey and l_suppkey,
    `save_table(stats_columns=...)` persists the footer stats sidecar at
    write time (the Delta ``add.stats`` twin), and the 2-column range
    predicate prunes files through ONE stats read. Single-column
    clustering can never prune the second column; the Z-curve makes
    both selective. Oracle = the same filter+agg over the full table;
    the actual multi-column pruning factor is pinned in
    tests/test_skipping.py.
    """
    from databricks_demo_feature_store_spark.operators import cluster_by_zorder
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.skipping import (
        load_file_stats,
        read_with_skipping,
    )
    from databricks_demo_feature_store_spark.sources.writers import save_table

    root = scratch_dir("skipping_z")
    path = os.path.join(root, "lineitem_z")
    li = load(spark, sf_dir, "lineitem")
    clustered = cluster_by_zorder(
        li, ["l_partkey", "l_suppkey"], bits=12, num_partitions=16
    )
    save_table(clustered, path, stats_columns=["l_partkey", "l_suppkey"])
    stats = load_file_stats(spark, path)
    df, _report = read_with_skipping(
        spark,
        path,
        stats,
        [
            ("l_partkey", ">=", 100.0),
            ("l_partkey", "<=", 300.0),
            ("l_suppkey", ">=", 10.0),
            ("l_suppkey", "<=", 40.0),
        ],
        residual=(
            "l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40"
        ),
    )
    return (
        df.groupBy("l_returnflag")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_skipping_bloom",
    oracle=f"""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           {_o_dsum('l_quantity', 2)} AS sum_qty,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey IN (1, 5, 7)
    GROUP BY 1
    ORDER BY l_orderkey
    """,
)
def q_skipping_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom sidecar skipping (sources/skipping.py
    write_bloom_sidecar) — the Delta bloom-filter-index twin: lineitem
    is HASH-distributed on l_orderkey, so every file's [min, max] spans
    the whole key domain and min/max skipping keeps all files; the
    per-file Bloom bitsets prune an equality/IN point lookup to the few
    files that can actually hold the keys. Skipping stays
    optimization-only: files lacking a Bloom row are kept and the full
    predicate re-applies as the residual, which is exactly what the
    full-scan oracle certifies. The measured file-reduction factor and
    the never-prune-blind guard are pinned in tests/test_skipping.py.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.skipping import (
        load_bloom_stats,
        load_file_stats,
        read_with_skipping,
    )
    from databricks_demo_feature_store_spark.sources.writers import save_table

    root = scratch_dir("skipping_bloom")
    path = os.path.join(root, "lineitem_hashed")
    li = load(spark, sf_dir, "lineitem")
    # hash layout: the worst case for min/max, the home turf for Bloom
    save_table(
        li.repartition(8, "l_orderkey"),
        path,
        stats_columns=["l_orderkey"],
        bloom_columns=["l_orderkey"],
    )
    stats = load_file_stats(spark, path)
    bloom = load_bloom_stats(spark, path)
    df, _report = read_with_skipping(
        spark,
        path,
        stats,
        [("l_orderkey", "in", [1.0, 5.0, 7.0])],
        residual="l_orderkey IN (1, 5, 7)",
        bloom=bloom,
    )
    return (
        df.groupBy(F.col("l_orderkey").cast("long").alias("l_orderkey"))
        .agg(
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "q_fs_forget",
    oracle="""
    WITH forget AS (
      SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
    ), t_all AS (SELECT c_custkey FROM customer),
    t_building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT * FROM (
      SELECT 'cust_features' AS tbl, TRUE AS key_matched,
             CAST((SELECT COUNT(*) FROM t_all WHERE c_custkey NOT IN (SELECT c_custkey FROM forget)) AS BIGINT) AS rows_after,
             CAST((SELECT COUNT(*) FROM t_all WHERE c_custkey IN (SELECT c_custkey FROM forget)) AS BIGINT) AS rows_deleted,
             CAST((SELECT SUM(c_custkey) FROM t_all WHERE c_custkey NOT IN (SELECT c_custkey FROM forget)) AS BIGINT) AS key_sum
      UNION ALL
      SELECT 'seg_features' AS tbl, TRUE AS key_matched,
             CAST((SELECT COUNT(*) FROM t_building WHERE c_custkey NOT IN (SELECT c_custkey FROM forget)) AS BIGINT) AS rows_after,
             CAST((SELECT COUNT(*) FROM t_building WHERE c_custkey IN (SELECT c_custkey FROM forget)) AS BIGINT) AS rows_deleted,
             CAST((SELECT SUM(c_custkey) FROM t_building WHERE c_custkey NOT IN (SELECT c_custkey FROM forget)) AS BIGINT) AS key_sum
    ) ORDER BY tbl
    """,
)
def q_fs_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation across a feature store
    (featurestore/manager.py forget_entities): register two feature
    tables keyed on the customer id, delete one deterministic key batch
    (negative account balances) through the manager, and report the
    audit PLUS a key-sum digest of each table's surviving rows read
    back from disk — so the oracle (which replays the deletion as plain
    SQL set logic) checks both the audit arithmetic and the actual
    post-delete table contents.
    """
    from databricks_demo_feature_store_spark.featurestore import forget_entities
    from databricks_demo_feature_store_spark.featurestore.manager import (
        FeatureStoreManager,
        FeatureTableSpec,
    )
    from databricks_demo_feature_store_spark.queries import scratch_dir

    root = scratch_dir("fs_forget")
    mgr = FeatureStoreManager(spark, root)
    c = load(spark, sf_dir, "customer")
    mgr.save(
        c.select("c_custkey", "c_acctbal", "c_mktsegment"),
        FeatureTableSpec(name="cust_features", primary_keys=("c_custkey",)),
        mode="overwrite",
    )
    mgr.save(
        c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_acctbal"),
        FeatureTableSpec(name="seg_features", primary_keys=("c_custkey",)),
        mode="overwrite",
    )
    forget = c.filter(F.col("c_acctbal") < 0.0).select("c_custkey")
    audit = forget_entities(mgr, forget, "c_custkey")
    digests = None
    for name in ("cust_features", "seg_features"):
        d = mgr.read(name).agg(
            F.lit(name).alias("tbl"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
        digests = d if digests is None else digests.unionByName(d)
    return (
        audit.withColumnRenamed("table", "tbl")
        .join(digests, "tbl")
        .select("tbl", "key_matched", "rows_after", "rows_deleted", "key_sum")
        .orderBy("tbl")
    )


@register(
    "q_incr_join_refresh",
    oracle=f"""
    WITH final_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderstatus <> 'P'
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    ), final_customer AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0.0 THEN 'RECLASSIFIED'
                  ELSE c_mktsegment END AS segment
      FROM customer
    )
    SELECT fc.segment,
           COUNT(*) AS n_orders,
           {_o_dsum('fo.o_totalprice', 2)} AS sum_price
    FROM final_orders fo JOIN final_customer fc ON fo.o_custkey = fc.c_custkey
    GROUP BY fc.segment
    ORDER BY fc.segment
    """,
)
def q_incr_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental equi-join view maintenance (featurestore/incremental.py
    refresh_join_view): materialize orders⋈customer over the pre-1999
    facts, then apply THREE deltas without recomputing the join —
    a fact-side delete batch (pending orders cancelled), a fact-side
    insert batch (the 1999+ orders arrive), and a dim-side update batch
    (negative-balance customers reclassified, every one of their orders
    re-deriving through the dim fanout). The oracle recomputes the join
    from the post-delta tables in plain SQL — equality of the grouped
    digest proves maintained ≡ recomputed.
    """
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        refresh_join_view,
    )

    cutoff = F.lit("1999-01-01").cast("timestamp")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"
    )
    c0 = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
    )
    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    f0 = o.filter(F.col("o_orderdate") < cutoff).select(fact_cols)
    dim0 = c0.select("c_custkey", "segment")
    view = f0.join(F.broadcast(dim0), F.col("o_custkey") == F.col("c_custkey"))

    # delta 1: fact deletes (pending orders cancelled)
    dels = f0.filter(F.col("o_orderstatus") == "P").select("o_orderkey")
    view = refresh_join_view(
        view, None, dim0, on=("o_custkey", "c_custkey"),
        replace_key="o_orderkey", deletes=dels,
    )
    # delta 2: fact inserts (the 1999+ orders arrive)
    f_new = o.filter(F.col("o_orderdate") >= cutoff).select(fact_cols)
    view = refresh_join_view(
        view, f_new, dim0, on=("o_custkey", "c_custkey"), replace_key="o_orderkey"
    )
    # delta 3: dim updates (negative balances reclassified) — replace by
    # the dim key; the unchanged side is the view's CURRENT fact set
    f_now = f0.filter(F.col("o_orderstatus") != "P").unionByName(f_new)
    dim_delta = (
        c0.filter(F.col("c_acctbal") < 0.0)
        .select("c_custkey", F.lit("RECLASSIFIED").alias("segment"))
    )
    view = refresh_join_view(
        view, dim_delta, f_now, on=("c_custkey", "o_custkey"), replace_key="c_custkey"
    )
    return (
        view.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("segment")
    )


@register(
    "q_incr_agg_join_refresh",
    oracle=f"""
    WITH final_customer AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0.0 THEN 'RECLASSIFIED'
                  ELSE c_mktsegment END AS segment
      FROM customer
    )
    SELECT fc.segment,
           CAST(SUM(x.n) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(x.s AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
    FROM (
      SELECT o_custkey, COUNT(o_totalprice) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS s
      FROM orders GROUP BY o_custkey) x
    JOIN final_customer fc ON x.o_custkey = fc.c_custkey
    GROUP BY fc.segment
    ORDER BY fc.segment
    """,
)
def q_incr_agg_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-join view maintenance — the dashboard
    materialization composed from the round's two IVM primitives:
    revenue-by-segment = orders ⋈ customer → groupBy(segment) is kept
    fresh WITHOUT ever re-scanning order history. The fact side lives
    as per-customer moment state (`aggregate_state`, one row per
    customer); a new order batch folds in via ONE delta-sized
    `merge_aggregate_state`; a dim reclassification costs NOTHING at
    maintenance time because the serve step joins the (dim-sized)
    state to the CURRENT dim and re-groups. The oracle recomputes from
    the post-delta tables in plain SQL — equality proves
    maintained-state serving ≡ full recompute, exactly (DECIMAL sums).
    """
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        aggregate_state,
        merge_aggregate_state,
    )

    cutoff = F.lit("1999-01-01").cast("timestamp")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # bootstrap: state over pre-1999 history (the one full scan, done once)
    state = aggregate_state(
        o.filter(F.col("o_orderdate") < cutoff),
        keys=["o_custkey"],
        value_col="o_totalprice",
        scale=2,
    )
    # delta: the 1999+ orders arrive as a batch — O(batch) maintenance
    delta = aggregate_state(
        o.filter(F.col("o_orderdate") >= cutoff),
        keys=["o_custkey"],
        value_col="o_totalprice",
        scale=2,
    )
    state = merge_aggregate_state(state, delta, keys=["o_custkey"])
    # dim update arrives: segments reclassified — no state maintenance at
    # all; the serve join sees the current dim
    dim = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0.0, F.lit("RECLASSIFIED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    return (
        state.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("segment")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum(F.col("s").cast("decimal(38,2)")).cast("double").alias("sum_price"),
        )
        .orderBy("segment")
    )


def _seasonal_ctes():
    """Shared integer-unit decomposition CTE chain (monthly revenue per
    segment → trend/seasonal units), reused by the decomposition oracle
    and the anomaly oracle."""
    return f"""
    WITH monthly AS (
      SELECT c.c_mktsegment AS seg,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS mon,
             {_o_dsum('o.o_totalprice', 2)} AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), units AS (
      SELECT seg, mon, revenue,
             CAST(CAST(revenue AS DECIMAL(38,4)) * 10000 AS BIGINT) AS vu
      FROM monthly
    ), staged AS (
      SELECT seg, mon, revenue, vu,
             (ROW_NUMBER() OVER wo - 1) % 12 AS pos,
             2 * SUM(vu) OVER w13 - LAG(vu, 6) OVER wo - LEAD(vu, 6) OVER wo
               AS t_num
      FROM units
      WINDOW wo AS (PARTITION BY seg ORDER BY mon),
             w13 AS (PARTITION BY seg ORDER BY mon
                     ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
    ), trended AS (
      SELECT *,
             CAST(sign(t_num) AS BIGINT)
               * ((2 * abs(t_num) + 24) // 48) AS tu
      FROM staged
    ), detr AS (
      SELECT *, vu - tu AS du FROM trended
    ), seas_raw AS (
      SELECT seg, pos,
             CAST(sign(SUM(du)) AS BIGINT)
               * ((2 * abs(SUM(du)) + COUNT(du)) // (2 * COUNT(du))) AS su
      FROM detr GROUP BY seg, pos
    ), seas AS (
      SELECT seg, pos,
             su - CAST(sign(SUM(su) OVER wk) AS BIGINT)
                  * ((2 * abs(SUM(su) OVER wk) + COUNT(su) OVER wk)
                     // (2 * COUNT(su) OVER wk)) AS eu
      FROM seas_raw
      WINDOW wk AS (PARTITION BY seg)
    )
    """


@register(
    "q_seasonal_decompose",
    oracle=_seasonal_ctes()
    + """
    SELECT d.seg, d.mon, d.revenue,
           CAST(d.tu AS DOUBLE) / 10000.0 AS trend,
           CAST(s.eu AS DOUBLE) / 10000.0 AS seasonal,
           CAST(d.vu - d.tu - s.eu AS DOUBLE) / 10000.0 AS residual
    FROM detr d JOIN seas s ON s.seg = d.seg AND s.pos = d.pos
    ORDER BY d.seg, d.mon
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (operators/windows.py
    seasonal_decompose) of monthly revenue per market segment: the 2×12
    centered-MA trend, per-(segment, cycle-position) seasonal means
    centered per segment, residual — all window sums and means routed
    through DECIMAL because sliding-window FP summation differs between
    engines (and between Spark's running-sum and DuckDB's segment-tree
    implementations), which would otherwise make the decomposition
    non-reproducible. The oracle replays every stage in SQL.
    """
    from databricks_demo_feature_store_spark.operators.windows import (
        seasonal_decompose,
    )

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.trunc("o_orderdate", "month").alias("mon"),
        )
        .agg(_dsum(F.col("o_totalprice"), 2).alias("revenue"))
    )
    return seasonal_decompose(
        monthly, keys=["seg"], time_col="mon", value_col="revenue", period=12
    ).orderBy("seg", "mon")


@register(
    "q_seasonal_anomalies",
    oracle=_seasonal_ctes()
    + """
    , resid AS (
      SELECT d.seg, d.mon, d.revenue,
             CAST(d.tu AS DOUBLE) / 10000.0 AS trend,
             CAST(s.eu AS DOUBLE) / 10000.0 AS seasonal,
             CAST(d.vu - d.tu - s.eu AS DOUBLE) / 10000.0 AS residual,
             d.vu - d.tu - s.eu AS ru
      FROM detr d JOIN seas s ON s.seg = d.seg AND s.pos = d.pos
    ), med AS (
      SELECT seg, quantile_cont(ru, 0.5) AS m FROM resid GROUP BY seg
    ), madt AS (
      SELECT r.seg, quantile_cont(abs(r.ru - med.m), 0.5) AS mad
      FROM resid r JOIN med ON med.seg = r.seg GROUP BY r.seg
    )
    SELECT r.seg, r.mon, r.revenue, r.trend, r.seasonal, r.residual,
           abs(r.ru - med.m) > 3.0 * 1.4826 * madt.mad AS is_anomaly
    FROM resid r
    JOIN med  ON med.seg = r.seg
    JOIN madt ON madt.seg = r.seg
    WHERE r.ru IS NOT NULL
    ORDER BY r.seg, r.mon
    """,
)
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust seasonal anomaly flags (operators/windows.py
    seasonal_anomalies): residual deviations beyond 3 robust sigmas
    (1.4826·MAD) of the per-segment residual median — alerting on the
    de-trended, de-seasonalized series. Median and MAD are EXACT
    percentiles of the integer-unit residuals (midpoint interpolation
    is .0/.5-exact on every engine), so even a row exactly ON the
    threshold flags identically cross-engine.
    """
    from databricks_demo_feature_store_spark.operators.windows import (
        seasonal_anomalies,
    )

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.trunc("o_orderdate", "month").alias("mon"),
        )
        .agg(_dsum(F.col("o_totalprice"), 2).alias("revenue"))
    )
    # only SCORED rows go through the gate: the MA-edge rows carry NULL
    # flags by design, and a NULL-boolean column defeats cross-engine row
    # alignment in pandas-based value comparison (None vs <NA> encodings)
    return (
        seasonal_anomalies(
            monthly, keys=["seg"], time_col="mon", value_col="revenue", period=12
        )
        .filter(F.col("is_anomaly").isNotNull())
        .orderBy("seg", "mon")
    )


@register(
    "q_version_changes",
    oracle="""
    WITH v0 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey % 7 <> 0
    ),
    v1 AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_mktsegment = 'BUILDING'
                  THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 5 <> 0
    ),
    ins AS (
      SELECT n.c_custkey, n.c_mktsegment, n.c_acctbal,
             'insert' AS _change_type
      FROM v1 n LEFT JOIN v0 o USING (c_custkey)
      WHERE o.c_custkey IS NULL
    ),
    del AS (
      SELECT o.c_custkey, o.c_mktsegment, o.c_acctbal,
             'delete' AS _change_type
      FROM v0 o LEFT JOIN v1 n USING (c_custkey)
      WHERE n.c_custkey IS NULL
    ),
    upd AS (
      SELECT o.c_custkey,
             o.c_mktsegment AS oseg, o.c_acctbal AS obal,
             n.c_mktsegment AS nseg, n.c_acctbal AS nbal
      FROM v0 o JOIN v1 n USING (c_custkey)
      WHERE o.c_acctbal IS DISTINCT FROM n.c_acctbal
         OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, c_acctbal, _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM (
      SELECT * FROM ins
      UNION ALL SELECT * FROM del
      UNION ALL SELECT c_custkey, oseg, obal, 'update_preimage' FROM upd
      UNION ALL SELECT c_custkey, nseg, nbal, 'update_postimage' FROM upd
    )
    ORDER BY c_custkey, _change_type
    """,
)
def q_version_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed between table versions (sources/versioned.py
    changes_between) — the Delta ``table_changes`` twin on the parquet
    time-travel store: v0 and v1 of a customer dimension differ by
    deletes (keys leaving), inserts (keys arriving) and updates
    (BUILDING balances doubled); the feed returns insert / delete /
    update_preimage / update_postimage rows with the commit version,
    unchanged keys drop out. ONE full-outer join on the key with the
    payload compared as a single null-safe struct. The oracle replays
    the diff with independent joins over the same two versions."""
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    v0 = cust.filter(F.col("c_custkey") % 7 != 0)
    v1 = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal") * 2
        ).otherwise(F.col("c_acctbal")),
    )
    vt = VersionedTable(spark, os.path.join(scratch_dir("cdf"), "customer_v"))
    vt.save(v0, operation="overwrite")
    vt.save(v1, operation="overwrite")
    return vt.changes_between(0, 1, ["c_custkey"]).orderBy(
        "c_custkey", "_change_type"
    )


@register(
    "q_deletion_vectors",
    oracle=f"""
    SELECT l_returnflag,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {_o_dsum('l_quantity', 2)} AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE NOT (l_quantity < 5) AND NOT (l_discount > 0.08)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion vectors (sources/deletion_vectors.py) — row-level
    deletes WITHOUT rewriting data files, the Delta DV twin: two delete
    waves record (file, row_index) coordinates in the hidden sidecar
    (accumulating by append; re-deleting is a set no-op), and the
    DV-aware read folds them out with ONE broadcast anti-join. The
    oracle is the equivalent NOT-predicate scan of the original table —
    equality proves the coordinate bookkeeping drops exactly the
    matching rows and nothing else. Physical materialization
    (apply_deletes ≡ rewritten table) and idempotence are pinned in
    tests/test_versioned.py.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.deletion_vectors import (
        delete_rows,
        read_with_deletes,
    )

    root = scratch_dir("dv")
    path = os.path.join(root, "lineitem_dv")
    load(spark, sf_dir, "lineitem").write.mode("overwrite").parquet(path)
    delete_rows(spark, path, "l_quantity < 5")
    delete_rows(spark, path, "l_discount > 0.08")
    df = read_with_deletes(spark, path)
    return (
        df.groupBy("l_returnflag")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_skipping_incremental",
    oracle=f"""
    SELECT CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS ship_month,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY 1
    ORDER BY ship_month
    """,
)
def q_skipping_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained skipping sidecar on an APPEND-mode
    table: the base load writes pre-1996 lineitem with a stats sidecar;
    the append wave adds 1996+ rows and `save_table(mode="append")`
    refreshes the sidecar INCREMENTALLY (immutable files' rows carry
    over verbatim, only the new files' footers are read). The range
    predicate then prunes through the MAINTAINED stats — the pre-1996
    base files drop without being re-harvested — and the oracle's
    full-scan equality proves maintained ≡ correct. The Bloom sidecar's
    incremental twin and maintained ≡ rebuilt (bit-for-bit, both
    sidecars) are pinned in tests/test_skipping.py; the full
    write-time Bloom path is gate-certified by q_skipping_bloom.
    """
    import datetime as dt

    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.skipping import (
        load_file_stats,
        read_with_skipping,
    )
    from databricks_demo_feature_store_spark.sources.writers import save_table

    root = scratch_dir("skipping_inc")
    path = os.path.join(root, "lineitem_inc")
    li = load(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_shipdate") < "1996-01-01")
    wave = li.filter(F.col("l_shipdate") >= "1996-01-01")
    save_table(
        base.repartitionByRange(4, "l_shipdate"),
        path,
        stats_columns=["l_shipdate"],
    )
    save_table(
        wave.repartitionByRange(4, "l_shipdate"),
        path,
        mode="append",
        stats_columns=["l_shipdate"],
    )
    stats = load_file_stats(spark, path)
    cut = dt.datetime(1996, 6, 1, tzinfo=dt.timezone.utc).timestamp()
    df, _report = read_with_skipping(
        spark,
        path,
        stats,
        [("l_shipdate", ">=", cut)],
        residual="l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'",
    )
    return (
        df.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("ship_month")
    )


@register(
    "q_incr_cdf_refresh",
    oracle=f"""
    WITH final_orders AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderstatus <> 'P'
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           {_o_dsum('fo.o_totalprice', 2)} AS sum_price
    FROM final_orders fo JOIN customer c ON fo.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def q_incr_cdf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven incremental view maintenance (featurestore/incremental.py
    refresh_join_view_from_cdf): the materialized orders⋈customer view is
    refreshed from the VERSIONED fact table's change feed — the caller
    never constructs Δ frames (the Delta Live Tables CDF→MV pattern,
    closing the loop between sources/versioned.py changes_between and
    refresh_join_view; the reference reads previous versions for its
    cross-checks at monitor.py:57-71). One commit mutates the fact table
    three ways at once — deletes (pending orders cancelled), updates
    (urgent orders re-priced ×2) and inserts (the 1999+ orders arrive) —
    and ONE change feed drives all three through the view. The oracle
    recomputes the join from the post-commit table in plain SQL:
    equality of the grouped digest proves CDF-maintained ≡ recomputed.
    """
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        refresh_join_view_from_cdf,
    )
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    cutoff = F.lit("1999-01-01").cast("timestamp")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderdate", "o_orderpriority",
    )
    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    f0 = o.filter(F.col("o_orderdate") < cutoff).select(fact_cols)
    f1 = (
        o.filter((F.col("o_orderdate") < cutoff) & (F.col("o_orderstatus") != "P"))
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        .select(fact_cols)
        .unionByName(o.filter(F.col("o_orderdate") >= cutoff).select(fact_cols))
    )
    vt = VersionedTable(spark, os.path.join(scratch_dir("cdf_ivm"), "orders_v"))
    vt.save(f0, operation="overwrite")
    vt.save(f1, operation="overwrite")

    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    view = vt.read(0).join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
    view = refresh_join_view_from_cdf(
        view, vt, "o_orderkey", dim, on=("o_custkey", "c_custkey")
    )
    return (
        view.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("segment")
    )


@register(
    "q_compact_policy",
    oracle=f"""
    SELECT l_returnflag,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {_o_dsum('l_quantity', 2)} AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey >= 1
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_compact_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-triggered auto-compaction (sources/writers.py
    CompactionPolicy / maybe_compact) — the Delta auto-compaction twin,
    driven like the round-12 drift-triggered index rebuild: two append
    waves land the table as 20 slivers; the policy attached to the
    second ``save_table(mode="append")`` sees the small-file count trip
    the threshold and rewrites the table through the staged-swap
    Z-order re-cluster (one range exchange), refreshing the stats
    sidecar for the NEW file layout in the same call. The query then
    reads back THROUGH ``read_with_skipping`` — its stale-stats
    coverage guard would raise if the policy had rewritten files
    without refreshing the sidecar — and returns the full-table digest
    the plain-scan oracle certifies: policy-compacted ≡ original,
    row for row. Threshold no-op, file-count reduction and DV folding
    are pinned in tests/test_catalog.py.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.skipping import (
        load_file_stats,
        read_with_skipping,
    )
    from databricks_demo_feature_store_spark.sources.writers import (
        CompactionPolicy,
        save_table,
    )

    root = scratch_dir("compact_policy")
    path = os.path.join(root, "lineitem_ac")
    li = load(spark, sf_dir, "lineitem")
    pre = li.filter(F.col("l_shipdate") < "1996-01-01")
    post = li.filter(F.col("l_shipdate") >= "1996-01-01")
    policy = CompactionPolicy(
        small_file_bytes=1 << 30,   # every local file counts as small
        min_small_files=12,         # wave 1 alone (10 files) must NOT trip
        target_file_bytes=1 << 30,
        zorder_by=("l_orderkey", "l_partkey"),
    )
    save_table(
        pre.repartition(10), path,
        stats_columns=["l_orderkey"], auto_compact=policy,
    )
    save_table(
        post.repartition(10), path, mode="append",
        stats_columns=["l_orderkey"], auto_compact=policy,
    )
    stats = load_file_stats(spark, path)
    df, _report = read_with_skipping(
        spark, path, stats, [("l_orderkey", ">=", 1.0)], residual="l_orderkey >= 1"
    )
    return (
        df.groupBy("l_returnflag")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_check_constraints",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {_o_dsum('o_totalprice', 2)} AS sum_price
    FROM orders
    WHERE o_totalprice >= 0 AND o_orderdate IS NOT NULL
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints end-to-end (sources/writers.py
    enforce_check_constraints, the Delta ``ADD CONSTRAINT CHECK`` twin):
    the orders table is filtered to the constraint domain, written
    through ``save_table(check_constraints=[...])`` — ALL constraints
    validate in ONE conditional-count aggregation over the checkpointed
    plan BEFORE any byte lands — and read back for the digest the
    plain-SQL oracle certifies: a constrained write is byte-equivalent
    to an unconstrained one when every row passes (the enforcement cost
    is one extra aggregation pass, not a rewrite). The rejection path
    (violations raise with per-constraint counts, table never
    half-poisoned) is pinned in tests/test_catalog.py. Registered in
    round 13 so the constraint machinery carries its own scaling row
    (VERDICT r12 task 4) and driver-gate surface.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir

    root = scratch_dir("check_constraints")
    path = os.path.join(root, "orders_checked")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") >= 0) & F.col("o_orderdate").isNotNull()
    )
    save_table(
        o,
        path,
        check_constraints=["o_totalprice >= 0", "o_orderdate IS NOT NULL"],
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_incr_cdf_agg_refresh",
    oracle="""
    WITH final_orders AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderstatus <> 'P'
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    SELECT o_custkey AS custkey,
           COUNT(o_totalprice) AS spend_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS spend_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
             / CAST(COUNT(o_totalprice) AS DOUBLE) AS spend_mean,
           SQRT(GREATEST(
             (CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
              - (CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                 * CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE))
                / CAST(COUNT(o_totalprice) AS DOUBLE))
             / CAST(COUNT(o_totalprice) AS DOUBLE), 0.0)) AS spend_std
    FROM final_orders
    GROUP BY o_custkey
    """,
)
def q_incr_cdf_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven AGGREGATE view maintenance (featurestore/incremental.py
    refresh_aggregate_state_from_cdf): per-customer spend moments built
    at v0 are folded forward through the versioned fact table's change
    feed — one commit carrying deletes (pending orders cancelled),
    updates (urgent orders re-priced ×2, pre-image subtracted AND
    post-image added) and inserts (the 1999+ orders). Because every
    state cell is an exact DECIMAL/integer sum, pre-image negation is
    exact and the maintained state is bit-identical to a full recompute
    over the post-commit table — which is what the oracle computes,
    finalized to count/sum/mean/std. This closes the update/delete gap
    that append-only merge_aggregate_state (q_incr_agg_refresh) leaves:
    O(changed rows) per refresh, fact history never rescanned.
    """
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        aggregate_state,
        finalize_aggregates,
        refresh_aggregate_state_from_cdf,
    )
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    cutoff = F.lit("1999-01-01").cast("timestamp")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderdate", "o_orderpriority",
    )
    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    f0 = o.filter(F.col("o_orderdate") < cutoff).select(fact_cols)
    f1 = (
        o.filter((F.col("o_orderdate") < cutoff) & (F.col("o_orderstatus") != "P"))
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        .select(fact_cols)
        .unionByName(o.filter(F.col("o_orderdate") >= cutoff).select(fact_cols))
    )
    vt = VersionedTable(spark, os.path.join(scratch_dir("cdf_agg_ivm"), "orders_v"))
    vt.save(f0, operation="overwrite")
    vt.save(f1, operation="overwrite")

    state0 = aggregate_state(vt.read(0), ["o_custkey"], "o_totalprice")
    state1 = refresh_aggregate_state_from_cdf(
        state0, vt, id_keys=["o_orderkey"], agg_keys=["o_custkey"],
        value_col="o_totalprice",
    )
    return finalize_aggregates(
        state1.withColumnRenamed("o_custkey", "custkey"), ["custkey"], prefix="spend"
    )


@register(
    "q_column_mapping",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_cust,
           {_o_dsum('c_acctbal', 2)} AS sum_balance
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def q_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping — rename WITHOUT rewriting data files
    (sources/column_mapping.py, the Delta ``columnMapping.mode=name``
    twin; the reference renames via full rewrite): half the customer
    table lands under the original physical names, the logical schema
    then renames c_mktsegment→segment and c_acctbal→balance as PURE
    metadata (one sidecar write, zero data IO), and the second half is
    appended THROUGH the mapping writer — logical names translated back
    to physical so both file generations stay consistent. The mapped
    read projects physical→logical with a zero-cost alias select
    (pushdown and pruning untouched), and its digest must equal the
    plain-SQL oracle over the base table: proof the rename lost, gained
    and mislabeled nothing across both file generations. Rename chains,
    collisions and the materialize escape hatch are pinned in
    tests/test_catalog.py.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.column_mapping import (
        read_with_mapping,
        rename_column,
        write_with_mapping,
    )

    root = scratch_dir("column_mapping")
    path = os.path.join(root, "customer_cm")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    c.filter(F.col("c_custkey") % 2 == 0).write.parquet(path)
    rename_column(spark, path, "c_mktsegment", "segment")
    rename_column(spark, path, "c_acctbal", "balance")
    late = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("balance"),
    )
    write_with_mapping(late, path, mode="append")
    return (
        read_with_mapping(spark, path)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _dsum(F.col("balance"), 2).alias("sum_balance"),
        )
        .orderBy("segment")
    )


@register(
    "q_manifest_snapshot",
    oracle=f"""
    SELECT l_returnflag,
           {_o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_manifest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest export + snapshot read (sources/manifest.py, the Delta
    ``GENERATE symlink_format_manifest`` twin): the pre-1996 lineitem
    wave lands, a manifest pins its file list, and THEN the 1996+ wave
    is appended — the manifest reader must see exactly the pinned
    snapshot, proving both the interop contract (an external engine
    consuming the file list gets a consistent table) and snapshot
    isolation on an append-only directory. The oracle computes the
    pre-1996 digest from the base table; equality means the manifest
    listed every pinned file and nothing else. The DV / column-mapping
    refusal guards (Delta's own symlink-manifest restrictions) are
    pinned in tests/test_catalog.py.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.manifest import (
        read_manifest,
        write_manifest,
    )

    root = scratch_dir("manifest")
    path = os.path.join(root, "lineitem_m")
    li = load(spark, sf_dir, "lineitem")
    li.filter(F.col("l_shipdate") < "1996-01-01").repartition(4).write.parquet(path)
    write_manifest(spark, path)
    # post-manifest append: invisible to the pinned snapshot
    li.filter(F.col("l_shipdate") >= "1996-01-01").repartition(2).write.mode(
        "append"
    ).parquet(path)
    return (
        read_manifest(spark, path)
        .groupBy("l_returnflag")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_generated_columns",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           COUNT(*) AS n_orders,
           {_o_dsum('o_totalprice', 2)} AS sum_price
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) >= 1997
    GROUP BY 1
    ORDER BY o_year
    """,
)
def q_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated columns (sources/writers.py save_table
    generated_columns, the Delta ``GENERATED ALWAYS AS`` twin): orders
    land with a DERIVED partition column ``o_year = year(o_orderdate)``
    computed at write time and used as the hive layout — the canonical
    Delta pattern that buys date partition-pruning without trusting
    callers to derive the column consistently (a caller-supplied wrong
    value rejects the write through the one-pass CHECK machinery,
    pinned in tests/test_catalog.py). The read back filters on the
    GENERATED column, so the pruning happens on partition directories,
    and the digest must equal the oracle computing the year directly
    from the base table — generation, layout and pruning lost nothing.
    """
    from databricks_demo_feature_store_spark.queries import scratch_dir

    root = scratch_dir("generated_cols")
    path = os.path.join(root, "orders_gen")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    save_table(
        o,
        path,
        partition_by=["o_year"],
        generated_columns={"o_year": "year(o_orderdate)"},
    )
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("o_year") >= 1997)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_year")
    )


@register(
    "q_version_restore",
    oracle="""
    WITH good AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
    ),
    bad AS (
      SELECT * FROM good WHERE c_acctbal > 1000
    ),
    appended AS (
      SELECT c_custkey, c_acctbal FROM good
      UNION ALL
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT * FROM (
      SELECT 0 AS version, COUNT(*) AS n_rows,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS bal_sum
      FROM good
      UNION ALL
      SELECT 1, COUNT(*),
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
      FROM bad
      UNION ALL
      SELECT 2, COUNT(*),
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
      FROM good
      UNION ALL
      SELECT 3, COUNT(*),
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
      FROM appended
    )
    ORDER BY version
    """,
)
def q_version_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE-to-version (sources/versioned.py restore) — the Delta
    ``RESTORE TABLE ... VERSION AS OF`` twin, the recovery op after a bad
    write: v0 is the good customer load, v1 a bad overwrite that lost
    the non-positive balances, restore(0) promotes v0's pinned file set
    to the new head v2 as pure hardlink metadata (zero data rewrite,
    history preserved — pinned in tests/test_versioned.py), and the
    post-restore append v3 diverges normally on top of the restored
    content. The result is the (version, count, exact balance sum)
    profile of all four versions; the oracle recomputes each version's
    content from the base table. Restore correctness is the v2 row
    equaling the v0 row AFTER v1 lost rows, and v3 building on v2."""
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    good = cust.filter(F.col("c_custkey") % 3 != 0)
    bad = good.filter(F.col("c_acctbal") > 1000)

    vt = VersionedTable(spark, os.path.join(scratch_dir("restore"), "cust_v"))
    vt.save(good, operation="WRITE")
    vt.save(bad, operation="OVERWRITE")      # the bad write
    vt.restore(0)                             # recovery: head v2 == v0
    # post-restore append diverges from the restored head
    vt.save(
        vt.read().unionByName(cust.filter(F.col("c_custkey") % 3 == 0)),
        operation="OVERWRITE",
    )

    profiles = [
        vt.read(v)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("c_acctbal"), 2).alias("bal_sum"),
        )
        .select(F.lit(v).alias("version"), "n_rows", "bal_sum")
        for v in (0, 1, 2, 3)
    ]
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out.orderBy("version")


@register(
    "q_version_clone",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0
    ),
    clone_next AS (
      SELECT * FROM src WHERE o_totalprice < 150000
    )
    SELECT * FROM (
      SELECT 'clone_v0' AS side, COUNT(*) AS n_rows,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS price_sum
      FROM src
      UNION ALL
      SELECT 'clone_v1', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
      FROM clone_next
      UNION ALL
      SELECT 'source_head', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
      FROM src
    )
    ORDER BY side
    """,
)
def q_version_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow clone (sources/versioned.py clone) — the Delta ``SHALLOW
    CLONE`` twin for cheap dev/test copies: the clone's v0 is the
    source's latest version with ZERO data-file copies (hardlink
    metadata, inode-asserted in tests/test_versioned.py), and each side
    evolves independently afterwards — the clone writes a filtered v1
    while the source head stays untouched. The result profiles clone v0
    (≡ source), clone v1 (diverged) and the source head (unchanged);
    the oracle recomputes all three from the base table."""
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    src_df = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).filter(F.col("o_orderkey") % 4 != 0)

    root = scratch_dir("clone")
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.save(src_df, operation="WRITE")
    dst = src.clone(os.path.join(root, "dst"))
    # post-clone divergence: clone evolves, source untouched
    dst.save(dst.read().filter(F.col("o_totalprice") < 150000))

    def profile(df: DataFrame, side: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("o_totalprice"), 2).alias("price_sum"),
        ).select(F.lit(side).alias("side"), "n_rows", "price_sum")

    return (
        profile(dst.read(0), "clone_v0")
        .unionByName(profile(dst.read(1), "clone_v1"))
        .unionByName(profile(src.read(), "source_head"))
        .orderBy("side")
    )


@register(
    "q_ohlc_bars",
    oracle="""
    WITH ticks AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS bar_date,
             ts, event_id, value
      FROM events
      WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id, bar_date
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, bar_date
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM ticks
    )
    SELECT user_id, bar_date,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           COUNT(*) AS n_ticks,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
             AS mean_value
    FROM ranked
    GROUP BY user_id, bar_date
    ORDER BY user_id, bar_date
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval OHLC downsampling (operators/timeseries.py
    ohlc_bars): raw events collapse to one daily bar per user carrying
    open/high/low/close/volume — ONE hash aggregation with map-side
    partial bars, open/close picked by struct-ordered min_by/max_by on
    the (ts, event_id) total order (deterministic under equal
    timestamps, where a sorted-window first/last is not), volume summed
    through DECIMAL. The oracle recomputes the bars with rank-1 window
    picks over the same total order."""
    from databricks_demo_feature_store_spark.operators.timeseries import ohlc_bars

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bars = ohlc_bars(
        ev, entity_col="user_id", ts_col="ts", value_col="value",
        tie_col="event_id", bucket="1 day",
    )
    return bars.select(
        "user_id",
        F.col("bar_start").cast("date").alias("bar_date"),
        "open_value", "high_value", "low_value", "close_value",
        "n_ticks", "sum_value", "mean_value",
    ).orderBy("user_id", "bar_date")


@register(
    "q_row_policy",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS c_name,
           '[REDACTED]' AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           CASE WHEN c_mktsegment IS NULL THEN NULL
                ELSE '***' || substr(c_mktsegment, length(c_mktsegment) - 3, 4)
           END AS c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 0
    ORDER BY c_custkey
    """,
)
def q_row_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed read (sources/governance.py): Unity-Catalog-style row
    filters + column masks applied at plan time for a non-exempt reader
    — rows outside the permitted segments (and non-positive balances)
    disappear via pushdown-eligible AND-folded predicates evaluated on
    RAW values (the segment row-filter reads the raw segment even
    though the same column is masked in the projection), names
    pseudonymize through sha2-256 (equality preserved), segments keep
    only their last 4 characters, nation keys redact to a constant,
    balances nullify with their own type. Pure projection+filter, zero
    shuffles, zero UDFs; the exempt-reader plan (raw passthrough) and
    the coverage audit are pinned in tests/test_governance.py."""
    from databricks_demo_feature_store_spark.sources.governance import (
        ColumnMask,
        ReadContext,
        RowFilter,
        TablePolicy,
        apply_policies,
    )

    policy = TablePolicy(
        row_filters=(
            RowFilter(
                "c_mktsegment IN ('BUILDING', 'MACHINERY')",
                exempt_groups=frozenset({"admins"}),
            ),
            RowFilter("c_acctbal > 0", exempt_groups=frozenset({"admins"})),
        ),
        column_masks=(
            ColumnMask("c_name", kind="hash"),
            ColumnMask("c_mktsegment", kind="partial_last", param=4),
            ColumnMask("c_nationkey", kind="redact"),
            ColumnMask(
                "c_acctbal", kind="nullify", exempt_groups=frozenset({"finance"})
            ),
        ),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    analyst = ReadContext(principal="analyst", groups=frozenset({"analysts"}))
    return apply_policies(cust, policy, analyst).orderBy("c_custkey")


@register(
    "q_version_schema_evolution",
    oracle="""
    WITH v0 AS (
      SELECT s_suppkey, s_nationkey, CAST(NULL AS DOUBLE) AS s_acctbal,
             0 AS _version
      FROM supplier WHERE s_suppkey % 2 = 0
    ),
    v1 AS (
      SELECT s_suppkey, s_nationkey, s_acctbal, 1 AS _version
      FROM supplier
    )
    SELECT _version, s_nationkey,
           COUNT(*) AS n_rows,
           COUNT(s_acctbal) AS n_with_balance,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS bal_sum
    FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
    GROUP BY 1, 2
    ORDER BY _version, s_nationkey
    """,
)
def q_version_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-version merge-schema audit read (sources/versioned.py
    read_all_versions): v0 lands suppliers WITHOUT the balance column,
    v1's overwrite adds it — the exact drift the manager's policy
    evolution produces — and the history scan unions both under the
    newest schema with nulls where v0 had no column, tagged with
    ``_version`` so filters prune whole version directories. The strict
    mode (merge_schema=False raises on drift) is pinned in
    tests/test_versioned.py."""
    from databricks_demo_feature_store_spark.queries import scratch_dir
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    sup = load(spark, sf_dir, "supplier")
    vt = VersionedTable(
        spark, os.path.join(scratch_dir("schema_evo"), "supplier_v")
    )
    vt.save(
        sup.filter(F.col("s_suppkey") % 2 == 0).select("s_suppkey", "s_nationkey"),
        operation="WRITE",
    )
    vt.save(
        sup.select("s_suppkey", "s_nationkey", "s_acctbal"),
        operation="OVERWRITE",
    )
    return (
        vt.read_all_versions(merge_schema=True)
        .groupBy("_version", "s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("s_acctbal").alias("n_with_balance"),
            _dsum(F.col("s_acctbal"), 2).alias("bal_sum"),
        )
        .orderBy("_version", "s_nationkey")
    )


@register(
    "q_ohlc_weekly_rollup",
    oracle="""
    WITH ticks AS (
      SELECT user_id,
             DATE '1970-01-01'
               + CAST(7 * (date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) // 7) AS INTEGER)
               AS week_date,
             ts, event_id, value
      FROM events
      WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id, week_date
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, week_date
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM ticks
    )
    SELECT user_id, week_date,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           COUNT(*) AS n_ticks,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
             AS mean_value
    FROM ranked
    GROUP BY user_id, week_date
    ORDER BY user_id, week_date
    """,
)
def q_ohlc_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable OHLC rollup (operators/timeseries.py merge_ohlc_bars):
    weekly bars derived from DAILY BARS ONLY — open carries from the
    earliest sub-bar, close from the latest, high/low fold, DECIMAL
    sums add — while the oracle computes the weekly bars DIRECTLY from
    the raw ticks: equality proves OHLC state is a merge monoid, the
    property that lets a 100 TB deployment re-grain bars at bar cost
    instead of rescanning ticks (epoch-aligned 7-day windows on both
    sides). merged ≡ direct is additionally pinned engine-side in
    tests/test_timeseries.py."""
    from databricks_demo_feature_store_spark.operators.timeseries import (
        merge_ohlc_bars,
        ohlc_bars,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ohlc_bars(
        ev, entity_col="user_id", ts_col="ts", value_col="value",
        tie_col="event_id", bucket="1 day",
    )
    weekly = merge_ohlc_bars(daily, entity_col="user_id", bucket="7 days")
    return weekly.select(
        "user_id",
        F.col("bar_start").cast("date").alias("week_date"),
        "open_value", "high_value", "low_value", "close_value",
        "n_ticks", "sum_value", "mean_value",
    ).orderBy("user_id", "week_date")
