"""Supplier-risk feature pipeline — the ``fs_cus_credit_risk`` flow:
rating CASE mapping on ingestion → availability shift → per-(entity,
month) aggregation → lag/diff/rate-of-change → rolling categorical min/max
→ RSI → standardized output with the ``chr_`` prefix.

Reference parity: rating mapping (``fs_cus_credit_risk.py:64-74``,
A..E → 1..5 CASE), monthly aggs (:213-261), the *intended* lag/diff/roc
semantics of its dead code (:273-324), rolling categorical stats
(:371-397), RSI (:167-202).

Determinism: the monthly revenue stays DECIMAL through the aggregation
and the RSI (whose rolling averages are exact-sum/count); the double copy
feeds lag/diff/roc where IEEE arithmetic is per-row deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_demo_feature_store_spark.pipelines.runner import Pipeline

KEYS = {"suppkey": "pk_supplier", "release_dt": "tpk_release_dt"}

SUPPLIER_RISK_STEPS = [
    # ingestion CASE: returnflag → ordinal risk rating (rating-map parity)
    {"op": "with_columns", "params": {"expressions": {
        "rating": "CASE l_returnflag WHEN 'R' THEN 3 WHEN 'A' THEN 2 ELSE 1 END",
        "revenue_dec": "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))"}}},
    {"op": "rename", "params": {"renames": {"l_suppkey": "suppkey"}}},
    {"op": "shift_date", "params": {
        "date_column": "l_shipdate", "new_column": "release_dt", "months_to_add": 1}},
    # one exchange on the supplier key serves the aggregation AND the
    # lag/rolling/RSI windows below (see runner._repartition_by)
    {"op": "repartition", "params": {"columns": ["suppkey"]}},
    {"op": "aggregate", "params": {
        "group_by": ["suppkey", "release_dt"],
        "operations": [
            {"column": "revenue_dec", "operation": "sum", "alias": "revenue_dec"},
            {"column": "rating", "operation": "max", "alias": "rating"},
            {"column": "l_orderkey", "operation": "count", "alias": "line_cnt"},
        ]}},
    {"op": "with_columns", "params": {"expressions": {
        "revenue": "CAST(revenue_dec AS DOUBLE)"}}},
    {"op": "lag_diff_roc", "params": {
        "columns": ["revenue"], "lags": [1],
        "partition_by": ["suppkey"], "order_by": ["release_dt"]}},
    {"op": "rolling_categorical", "params": {
        "columns": ["rating"], "window_sizes": [3],
        "partition_by": ["suppkey"], "order_by": ["release_dt"]}},
    {"op": "rsi", "params": {
        "column": "revenue_dec", "partition_by": ["suppkey"],
        "order_by": ["release_dt"], "periods": 6, "alias": "revenue_rsi_6"}},
    {"op": "drop", "params": {"columns": ["revenue_dec"]}},
    {"op": "rename", "params": {"renames": KEYS}},
    {"op": "prefix_columns", "params": {
        "prefix": "chr_", "exclude": list(KEYS.values())}},
    {"op": "standardize_output", "params": {}},
]

SUPPLIER_RISK_PIPELINE = Pipeline(SUPPLIER_RISK_STEPS, name="fs_supplier_risk")


def supplier_risk_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the pipeline over the lineitem fact table."""
    from databricks_demo_feature_store_spark.queries import load

    lineitem = load(spark, sf_dir, "lineitem")
    return SUPPLIER_RISK_PIPELINE.run(lineitem)
