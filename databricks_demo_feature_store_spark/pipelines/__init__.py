"""Declarative pipeline surface: config-driven runner + feature pipelines."""

from databricks_demo_feature_store_spark.pipelines.runner import OPS, Pipeline, Step
from databricks_demo_feature_store_spark.pipelines.standardize import (
    feature_output_standardize,
    prefix_columns,
)
from databricks_demo_feature_store_spark.pipelines.customer_features import (
    CUSTOMER_TX_PIPELINE,
    CUSTOMER_TX_STEPS,
    customer_transaction_features,
)
from databricks_demo_feature_store_spark.pipelines.supplier_risk_features import (
    SUPPLIER_RISK_PIPELINE,
    SUPPLIER_RISK_STEPS,
    supplier_risk_features,
)
from databricks_demo_feature_store_spark.pipelines.product_holdings_features import (
    PRODUCT_HOLDINGS_PIPELINE,
    PRODUCT_HOLDINGS_STEPS,
    product_holdings_features,
)
from databricks_demo_feature_store_spark.pipelines.demographic_features import (
    DEMOGRAPHIC_PIPELINE,
    DEMOGRAPHIC_STEPS,
    customer_demographic_features,
)
from databricks_demo_feature_store_spark.pipelines.payment_behavior_features import (
    PAYMENT_BEHAVIOR_PIPELINE,
    PAYMENT_BEHAVIOR_STEPS,
    payment_behavior_features,
)

__all__ = [
    "OPS", "Pipeline", "Step",
    "feature_output_standardize", "prefix_columns",
    "CUSTOMER_TX_PIPELINE", "CUSTOMER_TX_STEPS", "customer_transaction_features",
    "DEMOGRAPHIC_PIPELINE", "DEMOGRAPHIC_STEPS", "customer_demographic_features",
    "SUPPLIER_RISK_PIPELINE", "SUPPLIER_RISK_STEPS", "supplier_risk_features",
    "PRODUCT_HOLDINGS_PIPELINE", "PRODUCT_HOLDINGS_STEPS", "product_holdings_features",
    "PAYMENT_BEHAVIOR_PIPELINE", "PAYMENT_BEHAVIOR_STEPS", "payment_behavior_features",
]
