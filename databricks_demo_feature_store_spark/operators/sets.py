"""Set operators.

Parity target: ``union_dataframes`` —
``src/packages/preprocessing/merge_tables/union.py:8-23``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_dataframes(*dfs: DataFrame, allow_missing_columns: bool = True) -> DataFrame:
    """Union by column name, tolerating missing columns (filled with NULL)."""
    if not dfs:
        raise ValueError("union_dataframes requires at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs
    )
