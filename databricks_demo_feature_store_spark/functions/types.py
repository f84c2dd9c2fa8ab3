"""Type-normalization casts and config-driven schema application.

Parity targets in the reference:

- ``decimals_to_floats`` — ``notebooks/utils.py:538-548`` (dtype-prefix scan
  ``t.startswith("decimal")``); library twin
  ``src/packages/preprocessing/transformers/transform_column.py:132-146``
- ``longs_to_integers`` — ``utils.py:552-564``
- ``schemas_validation`` config-driven cast+rename —
  ``src/packages/data_validation/schemas.py:13-63`` (incl. the
  ``yyyy-MM-qq`` quarter format at :46-52)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DecimalType, LongType


def decimals_to_floats(df: DataFrame, to: str = "double") -> DataFrame:
    """Cast every DECIMAL column to float/double (feature-output rule)."""
    casts = {
        f.name: F.col(f.name).cast(to)
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType)
    }
    return df.withColumns(casts) if casts else df


def longs_to_integers(df: DataFrame) -> DataFrame:
    """Cast every LONG column to INT (feature-output rule)."""
    casts = {
        f.name: F.col(f.name).cast("int")
        for f in df.schema.fields
        if isinstance(f.dataType, LongType)
    }
    return df.withColumns(casts) if casts else df


def standardize_feature_output(df: DataFrame) -> DataFrame:
    """The combined cast rule applied at the end of every pipeline —
    ``fs_cus_demographic.py:380-384``."""
    return longs_to_integers(decimals_to_floats(df))


def apply_schema(df: DataFrame, spec: Sequence[Mapping[str, str]]) -> DataFrame:
    """Config-driven per-column rename + cast on ingestion.

    Each entry: ``{"source": col, "name": new_name, "data_type": spark_type,
    "format_source": date_fmt?}``. Date columns with format ``yyyy-MM-qq``
    get the quarter-marker replacement (q1→01, q2→16) the reference applies
    at ``schemas.py:46-52``.
    """
    out = df
    selected = []
    for entry in spec:
        src = entry.get("source", entry["name"])
        name = entry["name"]
        dtype = entry.get("data_type")
        fmt = entry.get("format_source")
        col = F.col(src)
        if dtype == "date" and fmt:
            if fmt == "yyyy-MM-qq":
                col = F.to_date(
                    F.regexp_replace(F.regexp_replace(col, "q1", "01"), "q2", "16"),
                    "yyyy-MM-dd",
                )
            else:
                col = F.to_date(col, fmt)
        elif dtype:
            col = col.cast(dtype)
        selected.append(col.alias(name))
    return out.select(*selected)
