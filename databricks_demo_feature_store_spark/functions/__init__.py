"""Scalar/column function families: dates, strings, feature generation,
data quality, type normalization."""

from databricks_demo_feature_store_spark.functions.dates import (
    shift_date,
    subtract_from_date,
    format_date_to_yyyymm,
    yearmonth_from_columns,
    difference_between_dates,
    months_between_dates,
)
from databricks_demo_feature_store_spark.functions.strings import (
    trim_string_columns,
    clean_accents,
    normalize_string_values,
    preprocess_ingested_table,
    standardize_column_names,
    concat_columns,
)
from databricks_demo_feature_store_spark.functions.feature_generation import (
    math_operations,
    calculate_ratios,
    calculate_percentages,
    choose_columns_as_value,
    categorize_by_fixed_values,
    binarize,
    create_constant_column,
    rfm_segments,
)
from databricks_demo_feature_store_spark.functions.quality import (
    standardize_na_values,
    drop_na,
    drop_duplicates,
    impute_dataframe,
    rename_columns,
)
from databricks_demo_feature_store_spark.functions.semistructured import (
    json_extract_typed,
    json_key_profile,
    json_schema_drift,
)
from databricks_demo_feature_store_spark.functions.types import (
    decimals_to_floats,
    longs_to_integers,
    apply_schema,
)

__all__ = [
    "shift_date", "subtract_from_date", "format_date_to_yyyymm",
    "yearmonth_from_columns", "difference_between_dates", "months_between_dates",
    "trim_string_columns", "clean_accents", "normalize_string_values",
    "preprocess_ingested_table", "standardize_column_names", "concat_columns",
    "math_operations", "calculate_ratios", "calculate_percentages",
    "choose_columns_as_value", "categorize_by_fixed_values", "binarize",
    "create_constant_column", "rfm_segments",
    "standardize_na_values", "drop_na", "drop_duplicates", "impute_dataframe",
    "rename_columns",
    "json_extract_typed", "json_key_profile", "json_schema_drift",
    "decimals_to_floats", "longs_to_integers", "apply_schema",
]
