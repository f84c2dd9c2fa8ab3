"""Reference-native source adapters: run the feature pipelines directly
off the reference's own table schemas (``demo_db.clientes`` / ``pagos`` /
``transacciones`` — the schemas the seeded generator reproduces, see
``sources/datagen.py`` and FIXTURES.md), not just the TPC-H-ish testdata
mapping.

This is the switch-over surface: a reference user points these adapters
at their existing tables and gets the same standardized feature output
the notebooks produce — ``fs_cus_payment_behavior`` via
:func:`payment_features_from_pagos`, ``fs_cus_demographic`` via
:func:`demographic_features_from_clientes`, ``fs_cus_transactions`` via
:func:`transaction_features_from_transacciones`.

Each adapter is (reference-schema ingestion projection) + (a declarative
Pipeline over the runner's allowlisted ops); the heavy lifting — windows,
aggregation, standardization — is the same code the TPC-H twins run, so
the oracle-gated verification transfers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_demo_feature_store_spark.operators import month_spine
from databricks_demo_feature_store_spark.pipelines.payment_behavior_features import (
    PAYMENT_BEHAVIOR_PIPELINE,
)
from databricks_demo_feature_store_spark.pipelines.runner import Pipeline
from databricks_demo_feature_store_spark.sources.datagen import pagos_to_payment_events


def payment_features_from_pagos(pagos: DataFrame) -> DataFrame:
    """``fs_cus_payment_behavior`` on the native ``pagos`` schema
    (reference ingestion scan ``fs_cus_payment_behavior.py:57-96``)."""
    return PAYMENT_BEHAVIOR_PIPELINE.run(pagos_to_payment_events(pagos))


#: fs_cus_demographic on clientes: spine × entities → tenure → segment
#: grouping → indicator flags → cdmg_ standardized output
#: (fs_cus_demographic.py:64-113, 176-193, 234-240, 374-378)
DEMOGRAPHIC_CLIENTES_STEPS = [
    {"op": "with_columns", "params": {"expressions": {
        "tenure_months": "CAST(months_between(release_dt, trunc(first_month, 'MM'), true) AS INT)"}}},
    {"op": "categorize", "params": {
        "column": "segmento_cliente", "new_column": "segment_group",
        "mapping": {
            "affluent": ["ELITE", "PREMIUM"],
            "mass": ["PRESTIGE", "SILVER"],
        },
        "default": "other"}},
    {"op": "binarize", "params": {"expressions": {
        "ind_high_income": "ingresos_mensuales >= 4000",
        "ind_urban": "zona_residencia = 'Urbano'",
        "ind_new_customer": "tenure_months <= 3"}}},
    {"op": "select", "params": {"columns": [
        "id_cliente", "release_dt", "tenure_months", "segment_group",
        "ingresos_mensuales", "ind_high_income", "ind_urban", "ind_new_customer"]}},
    {"op": "rename", "params": {"renames": {
        "id_cliente": "pk_customer", "release_dt": "tpk_release_dt"}}},
    {"op": "prefix_columns", "params": {
        "prefix": "cdmg_", "exclude": ["pk_customer", "tpk_release_dt"]}},
    {"op": "standardize_output", "params": {}},
]

DEMOGRAPHIC_CLIENTES_PIPELINE = Pipeline(
    DEMOGRAPHIC_CLIENTES_STEPS, name="fs_cus_demographic[clientes]"
)


def demographic_features_from_clientes(
    clientes: DataFrame,
    start_date: str,
    end_date: str,
) -> DataFrame:
    """``fs_cus_demographic`` on the native ``clientes`` schema: monthly
    snapshots for every customer active in [start_date, end_date],
    activation-filtered on ``fecha_apertura`` (the reference's
    ``release_dt >= fecha_apertura`` predicate, :109-113)."""
    entities = clientes.select(
        "id_cliente",
        "ingresos_mensuales",
        "zona_residencia",
        "segmento_cliente",
        F.trunc(F.col("fecha_apertura").cast("date"), "month").alias("first_month"),
    )
    spine = month_spine(
        entities,
        entity_keys=[
            "id_cliente", "ingresos_mensuales", "zona_residencia",
            "segmento_cliente", "first_month",
        ],
        start_date=start_date,
        end_date=end_date,
        date_col="release_dt",
        open_date_col="first_month",
    )
    return DEMOGRAPHIC_CLIENTES_PIPELINE.run(spine)


#: fs_cus_transactions on the native transacciones schema: the table is
#: already monthly-consolidated, so the flow is shift → lags → rolling →
#: ratios → ctrx_ standardized output (fs_cus_transactions.py lag/rolling
#: blocks; no aggregation stage needed)
TRANSACTIONS_NATIVE_STEPS = [
    {"op": "shift_date", "params": {
        "date_column": "event_dt", "new_column": "release_dt", "months_to_add": 1}},
    {"op": "with_columns", "params": {"expressions": {
        "monto_total_transacciones": "CAST(monto_total_transacciones AS DOUBLE)"}}},
    {"op": "lags", "params": {
        "columns": ["monto_total_transacciones"], "lags": [1, 3],
        "partition_by": ["id_cliente"], "order_by": ["release_dt"]}},
    {"op": "rolling_numeric", "params": {
        "columns": ["monto_total_transacciones"], "window_sizes": [3],
        "partition_by": ["id_cliente"], "order_by": ["release_dt"]}},
    {"op": "rolling_categorical", "params": {
        "columns": ["numero_transacciones"], "window_sizes": [3],
        "partition_by": ["id_cliente"], "order_by": ["release_dt"]}},
    {"op": "ratios", "params": {"pairs": [
        ("monto_total_transacciones", "numero_transacciones")]}},
    {"op": "drop", "params": {"columns": ["event_dt", "periodo"]}},
    {"op": "rename", "params": {"renames": {
        "id_cliente": "pk_customer", "release_dt": "tpk_release_dt"}}},
    {"op": "prefix_columns", "params": {
        "prefix": "ctrx_", "exclude": ["pk_customer", "tpk_release_dt"]}},
    {"op": "standardize_output", "params": {}},
]

TRANSACTIONS_NATIVE_PIPELINE = Pipeline(
    TRANSACTIONS_NATIVE_STEPS, name="fs_cus_transactions[transacciones]"
)


def transaction_features_from_transacciones(transacciones: DataFrame) -> DataFrame:
    """``fs_cus_transactions`` on the native monthly ``transacciones``
    schema (``periodo`` as 'yyyy-MM')."""
    base = transacciones.withColumn(
        "event_dt", F.to_date(F.concat(F.col("periodo"), F.lit("-01")))
    )
    return TRANSACTIONS_NATIVE_PIPELINE.run(base)


def run_reference_stack(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    start_date: str,
    end_date: str,
) -> dict[str, DataFrame]:
    """Run every adapter over a dict of reference-native tables
    (``clientes`` / ``pagos`` / ``transacciones``) — the one-call
    switch-over for a reference deployment."""
    return {
        "fs_cus_demographic": demographic_features_from_clientes(
            tables["clientes"], start_date, end_date
        ),
        "fs_cus_payment_behavior": payment_features_from_pagos(tables["pagos"]),
        "fs_cus_transactions": transaction_features_from_transacciones(
            tables["transacciones"]
        ),
    }
