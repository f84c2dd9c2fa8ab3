"""Customer-demographic snapshot pipeline — the ``fs_cus_demographic``
flow (SURVEY §3.1): month spine × entities → activation filter → tenure →
categorical groupings → indicator flags → standardized feature output.

The spine is generated distributed (``sequence``/``explode`` broadcast
into the cross join) instead of the reference's driver-side pandas
(``fs_cus_demographic.py:64-84``); the activation predicate
``release_dt >= first month`` reproduces its
``release_dt >= fecha_apertura`` (:109-113).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_demo_feature_store_spark.operators import month_spine
from databricks_demo_feature_store_spark.pipelines.runner import Pipeline

DEMOGRAPHIC_STEPS = [
    # tenure in whole months since activation (reference tenure feature,
    # fs_cus_demographic.py:234-240)
    {"op": "with_columns", "params": {"expressions": {
        "tenure_months": "CAST(months_between(release_dt, trunc(first_month, 'MM'), true) AS INT)"}}},
    # categorical grouping (education/marital CASE twin, :176-193)
    {"op": "categorize", "params": {
        "column": "c_mktsegment", "new_column": "segment_group",
        "mapping": {
            "consumer": ["AUTOMOBILE", "HOUSEHOLD"],
            "business": ["BUILDING", "MACHINERY"],
        },
        "default": "other"}},
    # indicator flags (binarize, feature_generation.py:287-317)
    {"op": "binarize", "params": {"expressions": {
        "ind_positive_balance": "c_acctbal > 0",
        "ind_new_customer": "tenure_months <= 3"}}},
    {"op": "select", "params": {"columns": [
        "custkey", "release_dt", "tenure_months", "segment_group",
        "c_acctbal", "ind_positive_balance", "ind_new_customer"]}},
    {"op": "rename", "params": {"renames": {
        "custkey": "pk_customer", "release_dt": "tpk_release_dt"}}},
    {"op": "prefix_columns", "params": {
        "prefix": "cdmg_", "exclude": ["pk_customer", "tpk_release_dt"]}},
    {"op": "standardize_output", "params": {}},
]

DEMOGRAPHIC_PIPELINE = Pipeline(DEMOGRAPHIC_STEPS, name="fs_cus_demographic")


def customer_demographic_features(
    spark: SparkSession,
    sf_dir: str,
    start_date: str = "1995-01-01",
    end_date: str = "1995-12-01",
) -> DataFrame:
    """Monthly demographic snapshots for every customer active in range."""
    from databricks_demo_feature_store_spark.queries import load

    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    first = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(F.trunc(F.col("o_orderdate").cast("date"), "month")).alias("first_month")
    )
    entities = customer.select(
        F.col("c_custkey").alias("custkey"), "c_acctbal", "c_mktsegment"
    ).join(first, on="custkey", how="inner")
    spine = month_spine(
        entities,
        entity_keys=["custkey", "c_acctbal", "c_mktsegment", "first_month"],
        start_date=start_date,
        end_date=end_date,
        date_col="release_dt",
        open_date_col="first_month",
    )
    return DEMOGRAPHIC_PIPELINE.run(spine)
