"""Payment-behavior feature pipeline — the ``fs_cus_payment_behavior``
flow, the fifth reference feature notebook: ingestion scan with rating
CASE → availability shift → ``time_features`` (credit duration / time to
close via ``months_between(...).cast('int')``) → per-(customer, month)
aggregation (SUM numerics, MAX categoricals, credit count) → rolling
numeric avg/std + categorical min/max over 3/6-month frames →
``calculate_percentages`` ratios → ``cpym_``-prefixed standardized output.

Reference parity: ingestion scan + rating mapping
(``notebooks/production/fs_cus_payment_behavior.py:57-96``), time features
(:120-159), ``calculate_aggregations`` (:264-313), rolling statistics
(:385-497), ``calculate_percentages`` (:506-521) and its application
(:651-657), ``feature_output_standarize`` 38-column select + ``cpym_``
prefix + DECIMAL→DOUBLE/LONG→INT (:666-756). The reference's
``calculate_lags_and_features`` (:327-371) builds lag transformations it
never applies and its output select drops them — the lag/diff/roc
semantics are covered for real by the supplier-risk pipeline, so this twin
matches the notebook's *actual* output surface.

Mapped onto the TPC-H-ish testdata: payments = lineitem ⋈ orders (a line
item is a payment event on its order's credit), credit term =
``l_quantity`` months from the order month, rating = order priority.

Determinism: amounts go DECIMAL(25,4) at ingestion so the monthly sums are
exact; doubles reappear only for the window stats (frame-ordered, both
engines accumulate identically); ``closing_date`` is derived from the
month-truncated order date so every ``months_between`` endpoint lands on
day 1 and the fractional day-of-month rule can't diverge between engines.

Scale: one equi-join on the order key (co-partitioned fact-to-fact join —
at warehouse scale both sides would be bucketed on orderkey, making it
shuffle-free), ONE hash aggregation, and all twelve numeric + twelve
categorical rolling columns share a single (id_customer, release_dt) sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_demo_feature_store_spark.pipelines.runner import Pipeline

KEYS = {"id_customer": "pk_customer", "release_dt": "tpk_release_dt"}
PREFIX = "cpym_"

#: fs_cus_payment_behavior.py:666-744 select order, pre-rename/prefix.
OUTPUT_COLUMNS = [
    "id_customer",
    "release_dt",
    "credits_cnt",
    "amt_total_balance_sum",
    "amt_paid_sum",
    "amt_total_credit_sum",
    "amt_installment_sum",
    "credit_duration_in_months",
    "time_to_close_in_months",
    "ind_installment_paid",
    "ind_did_min_payment",
    "rating_num",
    "amt_total_balance_sum_ravg_3m",
    "amt_total_balance_sum_rstd_3m",
    "amt_total_balance_sum_ravg_6m",
    "amt_total_balance_sum_rstd_6m",
    "amt_paid_sum_ravg_3m",
    "amt_paid_sum_rstd_3m",
    "amt_paid_sum_ravg_6m",
    "amt_paid_sum_rstd_6m",
    "amt_installment_sum_ravg_3m",
    "amt_installment_sum_rstd_3m",
    "amt_installment_sum_ravg_6m",
    "amt_installment_sum_rstd_6m",
    "ind_installment_paid_rmin_3m",
    "ind_installment_paid_rmax_3m",
    "ind_installment_paid_rmin_6m",
    "ind_installment_paid_rmax_6m",
    "ind_did_min_payment_rmin_3m",
    "ind_did_min_payment_rmax_3m",
    "ind_did_min_payment_rmin_6m",
    "ind_did_min_payment_rmax_6m",
    "rating_num_rmin_3m",
    "rating_num_rmax_3m",
    "rating_num_rmin_6m",
    "rating_num_rmax_6m",
    "amt_paid_sum_pct",
    "amt_total_balance_sum_pct",
    "time_to_close_in_months_pct",
]

PAYMENT_BEHAVIOR_STEPS = [
    # availability shift: payments observed in month M release in M+1
    # (event_dt is the month-start date the reference parses from 'yyyy-MM')
    {"op": "shift_date", "params": {
        "date_column": "event_date", "new_column": "event_dt", "months_to_add": 0}},
    {"op": "shift_date", "params": {
        "date_column": "event_date", "new_column": "release_dt", "months_to_add": 1}},
    # time_features (fs_cus_payment_behavior.py:120-159)
    {"op": "months_between", "params": {
        "start_column": "openning_date", "end_column": "closing_date",
        "new_column": "credit_duration_in_months"}},
    {"op": "months_between", "params": {
        "start_column": "event_dt", "end_column": "closing_date",
        "new_column": "time_to_close_in_months"}},
    # one exchange on the customer key serves the aggregation AND the
    # rolling windows below (see runner._repartition_by)
    {"op": "repartition", "params": {"columns": ["id_customer"]}},
    # calculate_aggregations (:264-313): count + SUM numerics + MAX
    # categoricals; the summed time features keep their base name, matching
    # the reference's withColumnsRenamed after the agg (:631-634)
    {"op": "aggregate", "params": {
        "group_by": ["id_customer", "release_dt"],
        "operations": [
            {"column": "id_customer", "operation": "count", "alias": "credits_cnt"},
            {"column": "amt_total_balance", "operation": "sum", "alias": "amt_total_balance_sum"},
            {"column": "amt_paid", "operation": "sum", "alias": "amt_paid_sum"},
            {"column": "amt_total_credit", "operation": "sum", "alias": "amt_total_credit_sum"},
            {"column": "amt_installment", "operation": "sum", "alias": "amt_installment_sum"},
            {"column": "credit_duration_in_months", "operation": "sum", "alias": "credit_duration_in_months"},
            {"column": "time_to_close_in_months", "operation": "sum", "alias": "time_to_close_in_months"},
            {"column": "ind_installment_paid", "operation": "max", "alias": "ind_installment_paid"},
            {"column": "ind_did_min_payment", "operation": "max", "alias": "ind_did_min_payment"},
            {"column": "rating_num", "operation": "max", "alias": "rating_num"},
        ]}},
    # decimal sums were exact; window stats run on their double copies
    {"op": "with_columns", "params": {"expressions": {
        "amt_total_balance_sum": "CAST(amt_total_balance_sum AS DOUBLE)",
        "amt_paid_sum": "CAST(amt_paid_sum AS DOUBLE)",
        "amt_total_credit_sum": "CAST(amt_total_credit_sum AS DOUBLE)",
        "amt_installment_sum": "CAST(amt_installment_sum AS DOUBLE)"}}},
    # calculate_rolling_statistics (:385-497), windows [3, 6]
    {"op": "rolling_numeric", "params": {
        "columns": ["amt_total_balance_sum", "amt_paid_sum", "amt_installment_sum"],
        "window_sizes": [3, 6],
        "partition_by": ["id_customer"], "order_by": ["release_dt"]}},
    {"op": "rolling_categorical", "params": {
        "columns": ["ind_installment_paid", "ind_did_min_payment", "rating_num"],
        "window_sizes": [3, 6],
        "partition_by": ["id_customer"], "order_by": ["release_dt"]}},
    # calculate_percentages application (:651-657)
    {"op": "percentages", "params": {"pairs": [
        ("amt_paid_sum", "amt_total_credit_sum"),
        ("amt_total_balance_sum", "amt_total_credit_sum"),
        ("time_to_close_in_months", "credit_duration_in_months")]}},
    # feature_output_standarize (:666-756)
    {"op": "select", "params": {"columns": OUTPUT_COLUMNS}},
    {"op": "rename", "params": {"renames": KEYS}},
    {"op": "prefix_columns", "params": {
        "prefix": PREFIX, "exclude": list(KEYS.values())}},
    {"op": "standardize_output", "params": {}},
]

PAYMENT_BEHAVIOR_PIPELINE = Pipeline(PAYMENT_BEHAVIOR_STEPS, name="fs_cus_payment_behavior")

#: rating mapping (reference maps calificacion A..E → 1..5, :66-76)
_RATING_CASE = (
    "CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 "
    "WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4 "
    "WHEN '5-LOW' THEN 5 ELSE 0 END"
)


def ingest_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingestion scan (reference ``spark.sql`` SELECT at :57-96):
    project + rename + row filters + rating CASE, all at the source so
    Catalyst pushes the predicates into both parquet scans before the
    order-key equi-join."""
    from databricks_demo_feature_store_spark.queries import load

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("o_custkey").isNotNull()
        & (F.col("o_custkey") != 999999999)  # sentinel id (reference :81)
        & F.col("o_orderpriority").isNotNull()
    )
    return joined.select(
        F.col("o_custkey").alias("id_customer"),
        F.col("l_shipdate").alias("event_date"),
        F.expr("CAST(o_orderdate AS DATE)").alias("openning_date"),
        # credit term: l_quantity months from the order month (day-1 date,
        # see module docstring determinism note)
        F.expr(
            "add_months(trunc(CAST(o_orderdate AS DATE), 'MM'), CAST(l_quantity AS INT))"
        ).alias("closing_date"),
        F.expr("CAST(l_extendedprice AS DECIMAL(25,4))").alias("amt_total_balance"),
        F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))").alias("amt_paid"),
        F.expr("CAST(l_extendedprice * (1 + l_tax) AS DECIMAL(25,4))").alias("amt_total_credit"),
        # the monthly financing charge stands in for the installment; the
        # 2dp×2dp product is exactly 4-decimal so the DECIMAL cast can't
        # land on a rounding tie (a /l_quantity formulation does, and the
        # engines break 5e-5 ties differently)
        F.expr("CAST(l_extendedprice * l_tax AS DECIMAL(25,4))").alias("amt_installment"),
        F.expr("CAST(l_returnflag = 'N' AS INT)").alias("ind_installment_paid"),
        F.expr("CAST(l_discount > 0 AS INT)").alias("ind_did_min_payment"),
        F.expr(_RATING_CASE).alias("rating_num"),
    )


def payment_behavior_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the pipeline over the ingested payment events."""
    return PAYMENT_BEHAVIOR_PIPELINE.run(ingest_payments(spark, sf_dir))
