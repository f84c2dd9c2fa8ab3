"""Product-holdings feature pipeline — the ``fs_cus_holding_products``
flow: pivot-FIRST (deterministic SUM(CASE WHEN) amounts + ``ind_*``
boolean holding indicators), multi-op numeric aggs named ``{col}_{op}_m``,
post-pivot ``na.fill(0)``, then rolling stats over a pivoted column.

Reference parity: manual pivot + LIT indicators
(``fs_cus_holding_products.py:279-300``), multi-op agg config
(:294-299,625-628), post-agg fill (:302-303), ``chp_`` prefix (:796-800).

Determinism: amounts aggregate in DECIMAL; the avg is exact-sum / count
computed explicitly (Spark's avg(DECIMAL) stays decimal while other
engines go double — dividing exact sums in IEEE doubles agrees everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_demo_feature_store_spark.pipelines.runner import Pipeline

KEYS = {"custkey": "pk_customer", "release_dt": "tpk_release_dt"}

PRODUCT_HOLDINGS_STEPS = [
    {"op": "rename", "params": {"renames": {"o_custkey": "custkey"}}},
    {"op": "shift_date", "params": {
        "date_column": "o_orderdate", "new_column": "release_dt", "months_to_add": 1}},
    {"op": "with_columns", "params": {"expressions": {
        "price_dec": "CAST(o_totalprice AS DECIMAL(25,2))"}}},
    # one exchange on the customer key serves the pivot aggregation AND the
    # rolling window below (see runner._repartition_by)
    {"op": "repartition", "params": {"columns": ["custkey"]}},
    # pivot-first: per-status amounts + holding indicators + multi-op aggs,
    # ONE hash aggregate
    {"op": "conditional_pivot", "params": {
        "group_by": ["custkey", "release_dt"],
        "pivot_column": "o_orderstatus",
        "categories": ["O", "F", "P"],
        "value_column": "price_dec",
        "prefix": "amt_",
        "indicators": True,
        "extra_operations": [
            {"column": "price_dec", "operation": "sum", "alias": "totalprice_sum_m"},
            {"column": "price_dec", "operation": "min", "alias": "totalprice_min_m"},
            {"column": "price_dec", "operation": "max", "alias": "totalprice_max_m"},
            {"column": "o_orderkey", "operation": "count", "alias": "n_orders_m"},
        ]}},
    # exact avg + double casts in one projection
    {"op": "with_columns", "params": {"expressions": {
        "totalprice_sum_m": "CAST(totalprice_sum_m AS DOUBLE)",
        "totalprice_min_m": "CAST(totalprice_min_m AS DOUBLE)",
        "totalprice_max_m": "CAST(totalprice_max_m AS DOUBLE)",
        "amt_o": "CAST(amt_o AS DOUBLE)",
        "amt_f": "CAST(amt_f AS DOUBLE)",
        "amt_p": "CAST(amt_p AS DOUBLE)",
        "totalprice_avg_m": "CAST(totalprice_sum_m AS DOUBLE) / n_orders_m"}}},
    # post-pivot fill for absent categories (reference :302-303) — amounts
    # already fill 0 via the CASE's ELSE; this covers derived NULLs
    {"op": "impute", "params": {"fill": 0.0, "subset": ["amt_o", "amt_f", "amt_p"]}},
    # rolling max of the open-order amount over 3 months
    {"op": "rolling_categorical", "params": {
        "columns": ["amt_o"], "window_sizes": [3],
        "partition_by": ["custkey"], "order_by": ["release_dt"]}},
    {"op": "rename", "params": {"renames": KEYS}},
    {"op": "prefix_columns", "params": {
        "prefix": "chp_", "exclude": list(KEYS.values())}},
    {"op": "standardize_output", "params": {}},
]

PRODUCT_HOLDINGS_PIPELINE = Pipeline(PRODUCT_HOLDINGS_STEPS, name="fs_cus_holding_products")


def product_holdings_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the pipeline over the orders fact table."""
    from databricks_demo_feature_store_spark.queries import load

    orders = load(spark, sf_dir, "orders")
    return PRODUCT_HOLDINGS_PIPELINE.run(orders)
