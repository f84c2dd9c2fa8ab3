"""End-to-end customer-transaction feature pipeline — the engine's
equivalent of a reference feature notebook, expressed as a declarative
:class:`~databricks_demo_feature_store_spark.pipelines.runner.Pipeline` config.

Mirrors the ``fs_cus_transactions`` flow (SURVEY §3.1 steps 3-7):
ingestion filter → availability shift (+1 month → ``release_dt``) →
per-(customer, month) aggregation with conditional pivot → lags →
rolling stats → ratios → PK rename / prefix / type standardization
(reference ``fs_cus_transactions.py:65-87,281-302,592-632,677-717``).

One shuffle for the aggregation, one window exchange for all time-series
columns (lags + rolling share the same (custkey, release_dt) sort), no
Python in the hot path — the whole pipeline is a single Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_demo_feature_store_spark.pipelines.runner import Pipeline

KEYS = {"custkey": "pk_customer", "release_dt": "tpk_release_dt"}
PREFIX = "ctrx_"

#: The declarative pipeline config (the reference embeds the same shape in
#: YAML-driven params — ``aggregation.py:82-108``).
CUSTOMER_TX_STEPS = [
    {"op": "filter", "params": {"conditions": ["o_totalprice IS NOT NULL"]}},
    {"op": "rename", "params": {"renames": {"o_custkey": "custkey"}}},
    # availability shift: orders observed in month M become available M+1
    {"op": "shift_date", "params": {
        "date_column": "o_orderdate", "new_column": "release_dt", "months_to_add": 1}},
    # exact money arithmetic for the aggregation
    {"op": "with_columns", "params": {"expressions": {
        "price_dec": "CAST(o_totalprice AS DECIMAL(25,2))"}}},
    # one exchange on the customer key serves the pivot aggregation AND the
    # lag/rolling windows below (see runner._repartition_by)
    {"op": "repartition", "params": {"columns": ["custkey"]}},
    # ONE hash aggregate: monthly totals + urgent-priority pivot + indicator
    {"op": "conditional_pivot", "params": {
        "group_by": ["custkey", "release_dt"],
        "pivot_column": "o_orderpriority",
        "categories": ["1-URGENT"],
        "value_column": "price_dec",
        "prefix": "amt_",
        "indicators": True,
        "extra_operations": [
            {"column": "price_dec", "operation": "sum", "alias": "total_spend"},
            {"column": "o_orderkey", "operation": "count", "alias": "order_cnt"},
        ],
    }},
    # back to double before window stats (decimal sums made them exact)
    {"op": "with_columns", "params": {"expressions": {
        "total_spend": "CAST(total_spend AS DOUBLE)",
        "amt_1_urgent": "CAST(amt_1_urgent AS DOUBLE)"}}},
    {"op": "lags", "params": {
        "columns": ["total_spend"], "lags": [1, 3],
        "partition_by": ["custkey"], "order_by": ["release_dt"]}},
    {"op": "rolling_numeric", "params": {
        "columns": ["total_spend"], "window_sizes": [3],
        "partition_by": ["custkey"], "order_by": ["release_dt"]}},
    {"op": "ratios", "params": {"pairs": [("amt_1_urgent", "total_spend")]}},
    {"op": "rename", "params": {"renames": KEYS}},
    {"op": "prefix_columns", "params": {
        "prefix": PREFIX, "exclude": list(KEYS.values())}},
    {"op": "standardize_output", "params": {}},
]

CUSTOMER_TX_PIPELINE = Pipeline(CUSTOMER_TX_STEPS, name="fs_cus_transactions")


def customer_transaction_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the pipeline over the orders fact table."""
    from databricks_demo_feature_store_spark.queries import load

    orders = load(spark, sf_dir, "orders")
    return CUSTOMER_TX_PIPELINE.run(orders)
