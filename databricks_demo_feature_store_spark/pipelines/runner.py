"""Config-driven pipeline runner — the engine's declarative surface.

Parity target: the reference's ``src/packages`` transform library is a
config-first contract — every transformer is ``(df, params) -> df`` built
for YAML-embedded configs (docstring examples at ``aggregation.py:82-108``,
``lags.py:71-80``), chained by notebook code. We make the chain itself
declarative: a pipeline is a list of ``{"op": name, "params": {...}}``
steps resolved against an allowlisted op registry (the same name-dispatch
surface the reference uses for functions, SURVEY §2.10).

The runner only composes lazy DataFrame transformations — no action is
triggered, so Catalyst sees the WHOLE pipeline as one logical plan and can
push filters/prune columns across step boundaries. Per SURVEY §4.3 there
are no eager count()/collect() debug actions in the hot path; opt-in
debugging wraps steps with an explain() callback instead.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark import functions as fx
from databricks_demo_feature_store_spark import operators as ops
from databricks_demo_feature_store_spark.functions.feature_generation import (
    spark_function_operations,
)
from databricks_demo_feature_store_spark.functions.types import (
    standardize_feature_output,
)
from databricks_demo_feature_store_spark.pipelines.standardize import prefix_columns


def _with_columns_expr(df: DataFrame, expressions: Mapping[str, str]) -> DataFrame:
    """Named SQL expressions in one projection (bulk ``withColumns``)."""
    return df.withColumns({name: F.expr(sql) for name, sql in expressions.items()})


def _select(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    return df.select(*columns)


def _repartition_by(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Hash-partition by key columns so every downstream operator keyed on
    a superset of ``columns`` (groupBy, window partitionBy) reuses ONE
    exchange instead of each inserting its own.

    The feature pipelines' shape is ``(key, month)`` aggregation followed
    by ``key``-partitioned rolling windows: planned naively that is two
    exchanges — a partial-agg shuffle on (key, month) and a full-result
    shuffle on key. Partitioning the RAW rows by key alone up front
    satisfies both (hash partitioning on a subset of the clustering keys),
    and because (key, month) group cardinality is high relative to
    rows-per-map-partition, map-side partial aggregation was reducing
    ~nothing while widening rows to N aggregation buffers — the raw-row
    shuffle moves FEWER bytes than the partial-state shuffle it replaces.
    No explicit partition count: AQE sizes the exchange from data volume
    (scale-adaptive, not tuned to the local core count)."""
    return df.repartition(*[F.col(c) for c in columns])


def _drop(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    return df.drop(*columns)


#: Allowlisted op registry: config name → (df, **params) -> df.
OPS: dict[str, Callable[..., DataFrame]] = {
    # projections / filters
    "select": _select,
    "drop": _drop,
    "repartition": _repartition_by,
    "select_distinct": ops.select_distinct,
    "filter": ops.filter_by_fixed_conditions,
    "filter_max": ops.filter_by_max_value,
    "with_columns": _with_columns_expr,
    # joins / sets
    "join": ops.make_join,
    "anti_join": ops.exclude_ids_anti_join,
    "pit_join": ops.point_in_time_join,
    "union": ops.union_dataframes,
    # aggregation / pivot
    "aggregate": ops.aggregation_operations,
    "conditional_pivot": ops.conditional_pivot,
    "window": ops.window_operations,
    # time series
    "lags": ops.generate_lags,
    "lag_diff_roc": ops.lag_diff_roc,
    "rolling_numeric": ops.rolling_numeric_stats,
    "rolling_categorical": ops.rolling_categorical_stats,
    "rsi": ops.relative_strength_index,
    "lags_ind": ops.create_lags_ind,
    # dates
    "shift_date": fx.shift_date,
    "months_between": fx.months_between_dates,
    # strings / cleaning
    "normalize_strings": fx.preprocess_ingested_table,
    "concat": fx.concat_columns,
    "na_standardize": fx.standardize_na_values,
    "impute": fx.impute_dataframe,
    "drop_na": fx.drop_na,
    "drop_duplicates": fx.drop_duplicates,
    "rename": fx.rename_columns,
    # feature generation
    "math": fx.math_operations,
    "ratios": fx.calculate_ratios,
    "percentages": fx.calculate_percentages,
    "case_value": fx.choose_columns_as_value,
    "categorize": fx.categorize_by_fixed_values,
    "binarize": fx.binarize,
    "constant": fx.create_constant_column,
    "spark_function": spark_function_operations,
    # output standardization
    "prefix_columns": prefix_columns,
    "standardize_output": standardize_feature_output,
}


@dataclass(frozen=True)
class Step:
    op: str
    params: Mapping[str, Any] = field(default_factory=dict)


class Pipeline:
    """An ordered, declarative chain of allowlisted transform steps."""

    def __init__(self, steps: Sequence[Mapping[str, Any] | Step], name: str = ""):
        self.name = name
        self.steps: list[Step] = [
            s if isinstance(s, Step) else Step(s["op"], s.get("params", {}))
            for s in steps
        ]
        unknown = [s.op for s in self.steps if s.op not in OPS]
        if unknown:
            raise ValueError(f"Unknown pipeline ops: {unknown}; allowed: {sorted(OPS)}")

    def run(
        self,
        df: DataFrame,
        debug: Callable[[str, DataFrame], None] | None = None,
    ) -> DataFrame:
        """Apply every step lazily; optional per-step debug callback
        (replaces the reference's eager count() logging decorators)."""
        out = df
        for step in self.steps:
            out = OPS[step.op](out, **step.params)
            if debug is not None:
                debug(step.op, out)
        return out
