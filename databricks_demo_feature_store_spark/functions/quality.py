"""Data-quality functions: NA standardization, drops, imputation, renames.

Parity targets in the reference:

- ``standardize_na_values`` — ``src/packages/preprocessing/clean/data_quality.py:10-38``
- ``drop_na`` / ``drop_duplicates`` — ``data_quality.py:41-76,78-112``
  (``"all"`` keyword means all columns)
- ``impute_dataframe`` — ``src/packages/preprocessing/transformers/transform_column.py:90-129``
- ``rename_columns`` — ``transform_column.py:58-87``
- duplicate-column dedup — ``src/packages/preprocessing/clean/clean_data.py:8-36``
  (the reference does a pandas transpose; ours is a pure projection)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame, functions as F


def standardize_na_values(
    df: DataFrame,
    columns: Sequence[str],
    na_values: Sequence[Any] = ("", "NA", "N/A", "null", "NULL", "None", "999999999"),
) -> DataFrame:
    """``when(col.isin(na_vals), NULL).otherwise(col)`` per column.

    Reference ``data_quality.py:10-38``; the sentinel ``'999999999'`` is the
    customer-id NA convention every ingestion filter drops
    (``fs_cus_credit_risk.py:78-82``).
    """
    return df.withColumns(
        {
            c: F.when(F.col(c).isin(list(na_values)), F.lit(None)).otherwise(F.col(c))
            for c in columns
        }
    )


def drop_na(df: DataFrame, subset: Sequence[str] | str = "all") -> DataFrame:
    """``df.na.drop(subset)`` with the reference's ``"all"`` keyword —
    ``data_quality.py:41-76``."""
    if subset == "all":
        return df.na.drop()
    return df.na.drop(subset=list(subset))


def drop_duplicates(df: DataFrame, subset: Sequence[str] | str = "all") -> DataFrame:
    """``df.dropDuplicates(subset)`` — ``data_quality.py:78-112``."""
    if subset == "all":
        return df.dropDuplicates()
    return df.dropDuplicates(list(subset))


def impute_dataframe(
    df: DataFrame, fill: Any | Mapping[str, Any], subset: Sequence[str] | None = None
) -> DataFrame:
    """``df.na.fill(value-or-dict)`` — ``transform_column.py:90-129``."""
    if isinstance(fill, Mapping):
        return df.na.fill(dict(fill))
    return df.na.fill(fill, subset=list(subset) if subset else None)


def rename_columns(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """Validated ``withColumnsRenamed`` — ``transform_column.py:58-87``."""
    missing = [c for c in renames if c not in df.columns]
    if missing:
        raise ValueError(f"Cannot rename missing columns: {missing}")
    return df.withColumnsRenamed(dict(renames))


def drop_duplicate_columns(df: DataFrame) -> DataFrame:
    """Keep the first occurrence of each column name — ``clean_data.py:8-36``
    re-expressed as a projection (no pandas transpose)."""
    seen: dict[str, int] = {}
    cols = []
    for i, c in enumerate(df.columns):
        if c not in seen:
            seen[c] = i
            cols.append(df[i])
    return df.select(*cols) if len(cols) != len(df.columns) else df


def prefix_columns(
    df: DataFrame, prefix: str, exclude: Sequence[str] = ()
) -> DataFrame:
    """Rename non-key columns with a table prefix (``cdmg_``, ``chr_``, …).

    Reference ``fs_cus_demographic.py:374-378`` (same block in all five
    pipelines).
    """
    renames = {c: f"{prefix}{c}" for c in df.columns if c not in set(exclude)}
    return df.withColumnsRenamed(renames)
