"""Filter operators.

Parity targets: ``filter_by_fixed_conditions`` (AND-fold of SQL expression
strings, reference ``src/packages/preprocessing/filter/filters.py:10-40``)
and ``filter_by_max_date`` / ``filter_max_value_in_column``
(``filters.py:43-64``, ``filter/dataframe.py:63-73``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, functions as F


def filter_by_fixed_conditions(df: DataFrame, conditions: Sequence[str]) -> DataFrame:
    """AND-fold a list of SQL boolean expression strings into one predicate.

    Reference: ``filters.py:10-40`` (fold at :32-34). Single ``filter`` call
    keeps the predicate as one conjunction so Catalyst can push each
    conjunct down to the scan independently.
    """
    if not conditions:
        return df
    predicate = reduce(lambda acc, cond: acc & F.expr(cond), conditions[1:], F.expr(conditions[0]))
    return df.filter(predicate)


def filter_dataframes(
    parameters: dict[str, dict[str, Sequence[str] | None]],
    **dfs: DataFrame,
) -> dict[str, DataFrame]:
    """Dict-of-DataFrames filter: apply per-table condition lists.

    Parity: ``filter_dataframe_by_fixed_conditions``
    (reference ``src/packages/preprocessing/filter/dataframe.py:76-116``).
    ``parameters[name]["conditions"]`` holds SQL boolean expression strings
    for table ``name``; tables without parameters (or with an empty/None
    list) pass through untouched.

    Differences from the reference, deliberate: the reference's private
    ``_filter_dataframe`` (``dataframe.py:12-61``) runs ``df.count()``
    before AND after each filter for logging — two full materializations
    per table, which at 100 TB is two extra jobs per input. We stay lazy
    and fold the conditions into one conjunction (same AND semantics) so
    Catalyst pushes each conjunct to the scan.
    """
    out: dict[str, DataFrame] = {}
    for name, df in dfs.items():
        conditions = (parameters.get(name) or {}).get("conditions") or []
        out[name] = filter_by_fixed_conditions(df, list(conditions))
    return out


def filter_by_max_value(df: DataFrame, column: str) -> DataFrame:
    """Keep rows where ``column`` equals its global maximum.

    The reference does a driver round-trip (``collect()`` the max, then
    filter — ``filters.py:43-64``). We express it declaratively with a
    window-less scalar aggregate via a cross join of the 1-row max, which
    Catalyst turns into a broadcast nested loop over a 1-row build side —
    no driver round-trip, one extra scan (or a reused exchange).
    """
    max_df = df.agg(F.max(column).alias("__max_val"))
    return (
        df.join(F.broadcast(max_df))
        .where(F.col(column) == F.col("__max_val"))
        .drop("__max_val")
    )
