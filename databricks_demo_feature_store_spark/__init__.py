"""databricks_demo_feature_store_spark — a PySpark-native feature-engineering
and analytics engine.

A clean-room, Spark-first re-implementation of the capabilities of the
reference project ``databricks-demo-ds-fs/databricks-demo-feature-store`` (batch feature
pipelines, a config-driven ``(df, params) -> df`` transformation library,
point-in-time joins, a feature-table writer with schema evolution, and a
data-validation subsystem), plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Everything is declarative DataFrame/SQL so Catalyst owns the physical plan;
no RDDs, no row-at-a-time Python UDFs in hot paths.
"""

from databricks_demo_feature_store_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
