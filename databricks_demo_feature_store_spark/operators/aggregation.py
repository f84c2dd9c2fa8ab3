"""Aggregation operators: name-dispatched group aggregation, pivot,
deterministic conditional pivot, and generic window-function application.

Parity targets in the reference:

- ``aggregation_operations`` — ``src/packages/preprocessing/transformers/aggregation.py:60-159``
- ``window_operations`` — ``aggregation.py:11-57``
- manual SUM(CASE WHEN) pivot + ``LIT`` boolean indicators —
  ``notebooks/development/fs_cus_holding_products.py:279-300`` and
  ``fs_cus_transactions.py:281-302``
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Window, functions as F

# Name-dispatch allowlist: the reference dispatches any pyspark.sql.functions
# name via getattr (``aggregation.py:53,120-126``); we keep the surface but
# restrict it so a config file can't call arbitrary functions.
_ALLOWED_AGG_FUNCS = {
    "sum", "avg", "mean", "min", "max", "count", "countDistinct",
    "count_distinct", "first", "last", "stddev", "stddev_samp", "stddev_pop",
    "variance", "var_samp", "var_pop", "skewness", "kurtosis", "collect_set",
    "collect_list", "approx_count_distinct", "median", "mode", "sum_distinct",
    "percentile_approx", "any_value", "bool_and", "bool_or",
}
_ALLOWED_WINDOW_FUNCS = _ALLOWED_AGG_FUNCS | {
    "row_number", "rank", "dense_rank", "percent_rank", "ntile", "cume_dist",
    "lag", "lead", "nth_value", "first_value", "last_value",
}


def _dispatch(func_name: str, allowed: set[str]) -> Any:
    if func_name not in allowed:
        raise ValueError(f"Aggregate function {func_name!r} is not in the allowlist")
    return getattr(F, func_name)


def _agg_exprs(operations: Sequence[Mapping[str, Any]]) -> list[Column]:
    """Build aggregate Columns from ``[{column, operation, alias?, args?}]``."""
    exprs: list[Column] = []
    for op in operations:
        fn = _dispatch(op["operation"], _ALLOWED_AGG_FUNCS)
        args = op.get("args", [])
        col = fn(op["column"], *args) if args else fn(op["column"])
        alias = op.get("alias") or f"{op['column']}_{op['operation']}"
        exprs.append(col.alias(alias))
    return exprs


def aggregation_operations(
    df: DataFrame,
    group_by: Sequence[str],
    operations: Sequence[Mapping[str, Any]],
    pivot_column: str | None = None,
    pivot_values: Sequence[str] | None = None,
    join_back: bool = False,
) -> DataFrame:
    """Generic groupBy + N aggregations, optional pivot, optional join-back.

    Reference: ``aggregation.py:60-159`` (dispatch :118-129, pivot :140-143,
    join-back :147-156). Differences for scale:

    - ``pivot_values`` should be passed explicitly when known — ``.pivot``
      without values runs an extra distinct job over the data.
    - ``join_back=True`` in the reference joins the agg result back to the
      source. When the group keys are the join keys that is exactly an
      aggregate-over-window; we implement it as the join the reference does
      (the window alternative is exposed via :func:`window_operations`).
    """
    grouped = df.groupBy(*group_by)
    exprs = _agg_exprs(operations)
    if pivot_column is not None:
        grouped = (
            grouped.pivot(pivot_column, list(pivot_values))
            if pivot_values
            else grouped.pivot(pivot_column)
        )
    result = grouped.agg(*exprs)
    if join_back:
        dup = [c for c in result.columns if c in df.columns and c not in group_by]
        result = df.drop(*dup).join(result, on=list(group_by), how="left")
    return result


def window_operations(
    df: DataFrame,
    partition_by: Sequence[str],
    operations: Sequence[Mapping[str, Any]],
    order_by: Sequence[str] | None = None,
    descending: bool = False,
) -> DataFrame:
    """Apply named window functions over ``partitionBy[, orderBy]``.

    Reference: ``aggregation.py:11-57`` (getattr dispatch :49-56). All new
    columns land in a single ``select("*", *ops)`` projection so the plan
    has one Window node per frame instead of N (reference does the same for
    rolling stats at ``fs_cus_credit_risk.py:444``).
    """
    w = Window.partitionBy(*partition_by)
    if order_by:
        cols = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
        w = w.orderBy(*cols)

    new_cols: list[Column] = []
    for op in operations:
        fn = _dispatch(op["operation"], _ALLOWED_WINDOW_FUNCS)
        args = op.get("args", [])
        column = op.get("column")
        if column is not None:
            col = fn(column, *args) if args else fn(column)
        else:
            col = fn(*args)
        alias = op.get("alias") or f"{column or op['operation']}_{op['operation']}"
        new_cols.append(col.over(w).alias(alias))
    return df.select("*", *new_cols)


def conditional_pivot(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_column: str,
    categories: Sequence[str],
    value_column: str | None = None,
    agg: str = "sum",
    prefix: str = "",
    indicators: bool = False,
    indicator_prefix: str = "ind_",
    extra_operations: Sequence[Mapping[str, Any]] = (),
    fill_value: float | int = 0,
    category_names: Mapping[str, str] | None = None,
    value_suffix: str = "",
    indicator_suffix: str = "",
) -> DataFrame:
    """Deterministic pivot via per-category conditional aggregation.

    Reference: the manual ``SUM(CASE WHEN pivot_col = c THEN x ELSE 0 END)``
    pivot at ``fs_cus_holding_products.py:279-300`` with the ``LIT``
    pseudo-op emitting boolean holding indicators ``ind_*`` (:283-287).

    ``category_names`` is the reference's ``cats_to_pivot`` rename map
    (pivot VALUE → output base name, e.g. ``credito_vehicular`` →
    ``vehicle_loan``); ``value_suffix`` / ``indicator_suffix`` append the
    reference's per-op aliases (``_amount_sum_m`` / ``_product``), so the
    exact notebook naming ``vehicle_loan_amount_sum_m`` /
    ``ind_vehicle_loan_product`` is expressible (:613-626). Defaults keep
    the plain ``{prefix}{safe(cat)}`` naming.

    Compared to ``GroupedData.pivot`` this keeps the output column set
    **deterministic** (derived from config, not from the data), which is
    what a feature store needs for stable schemas — and it compiles to a
    single hash aggregate with no extra distinct job.
    """
    import re

    exprs: list[Column] = []
    fn = _dispatch(agg, _ALLOWED_AGG_FUNCS)
    for cat in categories:
        safe = re.sub(r"_+", "_", re.sub(r"[^a-z0-9]+", "_", cat.strip().lower())).strip("_")
        base = category_names.get(cat, safe) if category_names else safe
        if value_column is not None:
            exprs.append(
                fn(
                    F.when(F.col(pivot_column) == cat, F.col(value_column)).otherwise(
                        F.lit(fill_value)
                    )
                ).alias(f"{prefix}{base}{value_suffix}")
            )
        if indicators:
            exprs.append(
                (
                    F.sum(
                        F.when(F.col(pivot_column) == cat, F.lit(1)).otherwise(F.lit(0))
                    )
                    > 0
                ).alias(f"{indicator_prefix}{base}{indicator_suffix}")
            )
    exprs.extend(_agg_exprs(extra_operations))
    return df.groupBy(*group_by).agg(*exprs)


def unpivot_columns(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long unpivot (melt) — the inverse of the pivot ops above:
    each input row emits one output row per value column, labeled with
    the column name. Narrow, shuffle-free (a Generate/Expand at scan
    speed; output width shrinks to id_cols + 2, so no column-width
    amplification survives the projection). Mixed value types resolve to
    Spark's LEAST COMMON type (int+double → double — never a silent
    truncation to the first column's type), probed via the analyzer's
    own ``array()`` coercion so the rule matches ``DataFrame.unpivot``
    exactly; columns with no common type raise an ``AnalysisException``
    at plan time. Expressed with ``stack`` so it runs identically on
    Spark 3.x."""
    if not value_cols:
        raise ValueError("unpivot_columns requires at least one value column")
    # schema-only probe: array() applies findWiderCommonType across its
    # elements — the same coercion native unpivot uses
    t = (
        df.select(F.array(*[F.col(c) for c in value_cols]).alias("__lct"))
        .schema[0]
        .dataType.elementType.simpleString()
    )
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stacked = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast(t).alias(c) for c in value_cols],
    ).selectExpr(
        *[f"`{c}`" for c in id_cols],
        f"stack({len(value_cols)}, {pairs}) AS (`{var_name}`, `{value_name}`)",
    )
    return stacked


# SQL renderings for the grouping-sets aggregate allowlist (3.5-compatible
# SQL path: GROUPING SETS has no DataFrame API before Spark 4.0).
_SQL_AGG_FUNCS = {
    "sum": "SUM", "avg": "AVG", "mean": "AVG", "min": "MIN", "max": "MAX",
    "count": "COUNT", "count_distinct": "COUNT(DISTINCT {col})",
    "stddev": "STDDEV_SAMP", "stddev_samp": "STDDEV_SAMP",
    "stddev_pop": "STDDEV_POP", "variance": "VAR_SAMP",
    "var_samp": "VAR_SAMP", "var_pop": "VAR_POP",
    # FIRST/LAST are deliberately NOT allowlisted: without an ORDER BY they
    # are nondeterministic in Spark SQL and cannot reproduce across runs or
    # against an oracle. ANY_VALUE stays for the explicit don't-care case.
    "any_value": "ANY_VALUE",
}


def grouping_sets_agg(
    df: DataFrame,
    grouping_sets: Sequence[Sequence[str]],
    operations: Sequence[Mapping[str, Any]],
    grouping_id_col: str = "grouping_level",
) -> DataFrame:
    """Multi-level aggregation over EXPLICIT grouping sets — the general
    form of :meth:`rollup`/:meth:`cube` (reference rollup twin:
    ``q_rollup_hierarchy``): Catalyst plans ONE Expand + hash aggregate
    for exactly the requested sets, instead of one job per level + a
    union (N scans, N shuffles) or a full 2^n cube filtered down.

    ``grouping_sets`` is a list of column-name lists; the empty list is
    the grand total. ``operations`` uses the same ``[{column, operation,
    alias?}]`` contract as :func:`aggregation_operations` restricted to
    the SQL-renderable allowlist. ``grouping_id_col`` carries
    ``grouping_id()`` so subtotal NULLs stay distinguishable from data
    NULLs.

    Scale shape: the Expand multiplies rows by the number of sets BEFORE
    the exchange, but partial (map-side) aggregation collapses each
    set's groups locally, so the shuffle carries |sets| × |groups| rows,
    not |sets| × |input|. Implemented through a one-shot temp view +
    ``spark.sql`` (GROUPING SETS has no DataFrame API on Spark 3.5);
    the view is dropped as soon as the statement is analyzed.
    """
    from uuid import uuid4

    from databricks_demo_feature_store_spark.functions.strings import (
        sql_identifier,
    )

    sets = [list(s) for s in grouping_sets]
    out_cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in out_cols:
                out_cols.append(c)
    for c in out_cols:
        if c not in df.columns:
            raise ValueError(f"grouping column {c!r} not in DataFrame")
    aggs: list[str] = []
    for op in operations:
        name = op["operation"]
        if name not in _SQL_AGG_FUNCS:
            raise ValueError(
                f"Aggregate {name!r} is not in the grouping-sets allowlist"
            )
        tmpl = _SQL_AGG_FUNCS[name]
        if op["column"] == "*":
            if name != "count":
                raise ValueError("'*' is only valid with operation 'count'")
            col = "*"
        else:
            col = sql_identifier(op["column"])
        rendered = (
            tmpl.format(col=col) if "{col}" in tmpl else f"{tmpl}({col})"
        )
        alias = op.get("alias") or f"{op['column']}_{name}"
        aggs.append(f"{rendered} AS {sql_identifier(alias)}")
    view = f"__grouping_sets_{uuid4().hex}"
    df.createOrReplaceTempView(view)
    try:
        sets_sql = ", ".join(
            "(" + ", ".join(sql_identifier(c) for c in s) + ")" for s in sets
        )
        select_cols = ", ".join(sql_identifier(c) for c in out_cols)
        sql = (
            f"SELECT {select_cols}, CAST(grouping_id() AS INT) AS "
            f"{sql_identifier(grouping_id_col)}, {', '.join(aggs)} "
            f"FROM {sql_identifier(view)} "
            f"GROUP BY GROUPING SETS ({sets_sql})"
        )
        # spark.sql analyzes eagerly, so the plan no longer needs the view
        return df.sparkSession.sql(sql)
    finally:
        df.sparkSession.catalog.dropTempView(view)
