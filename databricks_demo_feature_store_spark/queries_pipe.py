"""Pipeline-level queries: the full declarative feature pipeline verified
end-to-end against a DuckDB oracle that replays every stage (filter,
availability shift, pivot aggregation, lags, rolling stats, ratios,
standardization renames and casts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_demo_feature_store_spark.functions.rounding import oracle_dround
from databricks_demo_feature_store_spark.pipelines import customer_transaction_features
from databricks_demo_feature_store_spark.queries import register


@register(
    "q_pipeline_customer_tx",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 1 MONTH AS DATE) AS release_dt,
             o_totalprice, o_orderpriority
      FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    agg AS (
      SELECT custkey, release_dt,
             SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN CAST(o_totalprice AS DECIMAL(25,2)) ELSE 0 END) AS amt_dec,
             SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) > 0 AS ind_urgent,
             SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS spend_dec,
             COUNT(*) AS order_cnt
      FROM base GROUP BY 1, 2
    ),
    m AS (
      SELECT custkey, release_dt,
             CAST(amt_dec AS DOUBLE) AS amt, ind_urgent,
             CAST(spend_dec AS DOUBLE) AS spend, order_cnt
      FROM agg
    ),
    w AS (
      SELECT *,
             LAG(spend, 1) OVER win AS lag1,
             LAG(spend, 3) OVER win AS lag3,
             {oracle_dround('AVG(spend) OVER f3')} AS ravg3,
             {oracle_dround('STDDEV_SAMP(spend) OVER f3')} AS rstd3
      FROM m
      WINDOW win AS (PARTITION BY custkey ORDER BY release_dt ASC),
             f3 AS (PARTITION BY custkey ORDER BY release_dt ASC
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(custkey AS INT) AS pk_customer,
           release_dt AS tpk_release_dt,
           amt AS ctrx_amt_1_urgent,
           ind_urgent AS ctrx_ind_1_urgent,
           spend AS ctrx_total_spend,
           CAST(order_cnt AS INT) AS ctrx_order_cnt,
           lag1 AS ctrx_total_spend_lag_1m,
           lag3 AS ctrx_total_spend_lag_3m,
           ravg3 AS ctrx_total_spend_ravg_3m,
           rstd3 AS ctrx_total_spend_rstd_3m,
           CASE WHEN spend IS NOT NULL AND spend <> 0
                THEN {oracle_dround('amt / spend')}
           END AS ctrx_amt_1_urgent_to_total_spend_ratio
    FROM w
    """,
)
def q_pipeline_customer_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative customer-transaction feature pipeline, end-to-end:
    scan → filter → availability shift → single-shuffle pivot aggregation →
    one-window-exchange lags+rolling → ratios → pk/tpk rename + ctrx_
    prefix + long→int / decimal→double standardization (the full
    fs_cus_transactions notebook flow, SURVEY §3.1)."""
    return customer_transaction_features(spark, sf_dir)


# ---------------------------------------------------------------------------
# Structured Streaming (availableNow replay of the events backlog)
# ---------------------------------------------------------------------------

from databricks_demo_feature_store_spark.streaming import (  # noqa: E402
    hourly_counts,
    read_events_stream,
    run_available_now,
    sessionize_stream,
)


@register(
    "q_stream_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts through the REAL streaming
    engine (file source → event-time window agg → availableNow replay →
    memory sink). The DECIMAL-routed sum makes the result identical to
    the batch answer regardless of micro-batch order."""
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(hourly_counts(stream))


@register(
    "q_stream_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_idx
    """,
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization through the streaming engine —
    the stateful-operator twin of the batch lag+cumsum (q_ext_sessionize).
    Spark's session end is last-event-time + gap; the oracle mirrors it."""
    stream = read_events_stream(spark, sf_dir)
    return run_available_now(sessionize_stream(stream, gap="30 minutes"))
