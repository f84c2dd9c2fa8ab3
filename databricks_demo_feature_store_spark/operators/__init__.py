"""Relational operators: selection, filters, joins, aggregation, windows, sets.

Every operator follows the reference's config-driven contract
``(DataFrame, params) -> DataFrame`` (see
``/root/reference/src/packages/preprocessing/transformers/aggregation.py:60-63``)
but stays fully lazy — no eager ``count()``/``collect()`` logging inside
operators (the reference's anti-pattern, SURVEY §4.3).
"""

from databricks_demo_feature_store_spark.operators.selection import select_columns, select_distinct
from databricks_demo_feature_store_spark.operators.filters import (
    filter_by_fixed_conditions,
    filter_by_max_value,
    filter_dataframes,
)
from databricks_demo_feature_store_spark.operators.joins import (
    make_join,
    point_in_time_join,
    point_in_time_multi_join,
    exclude_ids_anti_join,
    month_spine,
    interval_join,
    bloom_filtered_join,
)
from databricks_demo_feature_store_spark.operators.aggregation import (
    aggregation_operations,
    grouping_sets_agg,
    window_operations,
    conditional_pivot,
)
from databricks_demo_feature_store_spark.operators.windows import (
    generate_lags,
    lag_diff_roc,
    rolling_numeric_stats,
    rolling_categorical_stats,
    relative_strength_index,
    create_lags_ind,
)
from databricks_demo_feature_store_spark.operators.sets import union_dataframes
from databricks_demo_feature_store_spark.operators.graph import (
    clustering_coefficient,
    pagerank,
    triangle_count,
)
from databricks_demo_feature_store_spark.operators.layout import zorder_key, cluster_by_zorder
from databricks_demo_feature_store_spark.operators.association import frequent_pairs
from databricks_demo_feature_store_spark.operators.linkage import golden_records, name_linkage
from databricks_demo_feature_store_spark.operators.graph import transitive_closure

__all__ = [
    "select_columns",
    "select_distinct",
    "filter_by_fixed_conditions",
    "filter_by_max_value",
    "filter_dataframes",
    "make_join",
    "point_in_time_join",
    "point_in_time_multi_join",
    "exclude_ids_anti_join",
    "month_spine",
    "interval_join",
    "bloom_filtered_join",
    "aggregation_operations",
    "grouping_sets_agg",
    "window_operations",
    "conditional_pivot",
    "generate_lags",
    "lag_diff_roc",
    "rolling_numeric_stats",
    "rolling_categorical_stats",
    "relative_strength_index",
    "create_lags_ind",
    "union_dataframes",
    "clustering_coefficient",
    "pagerank",
    "triangle_count",
    "zorder_key",
    "cluster_by_zorder",
    "frequent_pairs",
    "name_linkage",
    "golden_records",
    "transitive_closure",
]
