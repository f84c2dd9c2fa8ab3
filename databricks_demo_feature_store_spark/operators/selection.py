"""Projection operators.

Parity targets: ``select_columns`` and ``select_distinct`` in the reference's
``src/packages/preprocessing/selection/selection.py:9-68``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def _validate_columns(df: DataFrame, columns: Sequence[str]) -> None:
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(
            f"Columns not present in DataFrame: {missing}. Available: {df.columns}"
        )


def select_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Projection with existence validation.

    Reference: ``selection.py:9-38``. Column pruning reaches the parquet
    scan via Catalyst (check ``ReadSchema`` in ``.explain``).
    """
    _validate_columns(df, columns)
    return df.select(*columns)


def select_distinct(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Project then deduplicate rows.

    Reference: ``selection.py:41-68``. ``distinct()`` is a hash aggregate on
    all projected columns — project *first* so the shuffle carries only the
    needed columns.
    """
    _validate_columns(df, columns)
    return df.select(*columns).distinct()
