"""Feature-table persistence, registry, and training-set assembly."""

from databricks_demo_feature_store_spark.featurestore.manager import (
    FeatureStoreManager,
    FeatureTableSpec,
    SchemaDiff,
    EvolutionPolicy,
    store_lineage,
    store_doctor,
    forget_entities,
)
from databricks_demo_feature_store_spark.featurestore.training import (
    FeatureLookup,
    WindowLookup,
    create_training_set,
    latest_features,
    negative_samples,
    refresh_training_set,
)

__all__ = [
    "FeatureStoreManager",
    "FeatureTableSpec",
    "SchemaDiff",
    "EvolutionPolicy",
    "store_lineage",
    "store_doctor",
    "forget_entities",
    "FeatureLookup",
    "WindowLookup",
    "create_training_set",
    "latest_features",
    "negative_samples",
    "refresh_training_set",
]
