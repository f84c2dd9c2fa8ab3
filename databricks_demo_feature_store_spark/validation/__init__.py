"""Data-validation subsystem: schema cast/rename, cross-checking,
freshness, validation logs (reference ``src/packages/data_validation/``)."""

from databricks_demo_feature_store_spark.validation.schemas import (
    schemas_validation,
    quarter_to_date,
    year_to_date,
    cast_column,
    missing_columns,
    QUARTER_FORMAT,
)
from databricks_demo_feature_store_spark.validation.evaluation import (
    average_precision,
    calibration_bins,
    cohens_kappa,
    decile_lift,
    feature_auc_screen,
    pr_curve,
    roc_auc,
    threshold_metrics,
)
from databricks_demo_feature_store_spark.validation.leakage import (
    pit_leakage_audit,
)
from databricks_demo_feature_store_spark.validation.integrity import (
    benford_deviation,
    privacy_audit,
    privacy_risk_groups,
)
from databricks_demo_feature_store_spark.validation.drift import (
    anomalies_from_counts,
    count_anomalies,
    cusum_changepoints,
    cusum_from_counts,
    ks_drift,
    psi_by_group,
    psi_drift,
    psi_numeric,
)
from databricks_demo_feature_store_spark.validation.skew import (
    serving_skew_audit,
)
from databricks_demo_feature_store_spark.validation.monitor import (
    monthly_counts,
    cross_check,
    dimension_drift,
    outdateness,
    profile_columns,
    OutdatenessResult,
    ValidationLog,
    SUMMARY_SCHEMA,
    DETAIL_SCHEMA,
)

__all__ = [
    "schemas_validation", "quarter_to_date", "year_to_date", "cast_column",
    "missing_columns", "QUARTER_FORMAT",
    "monthly_counts", "cross_check", "anomalies_from_counts",
    "count_anomalies", "cusum_changepoints", "cusum_from_counts",
    "dimension_drift",
    "ks_drift", "psi_by_group", "psi_drift", "psi_numeric", "roc_auc",
    "calibration_bins", "decile_lift", "threshold_metrics",
    "average_precision", "pr_curve", "feature_auc_screen", "cohens_kappa",
    "pit_leakage_audit", "serving_skew_audit",
    "benford_deviation", "privacy_audit", "privacy_risk_groups",
    "outdateness", "profile_columns",
    "OutdatenessResult", "ValidationLog", "SUMMARY_SCHEMA", "DETAIL_SCHEMA",
]
