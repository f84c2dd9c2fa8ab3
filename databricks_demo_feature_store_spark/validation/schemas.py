"""Config-driven cast + rename on ingestion (``schemas_validation``).

Parity target: reference ``src/packages/data_validation/schemas.py:13-63`` —
per-column ``{name, data_type, format_source}`` config applied to the raw
ingested table; the special date format ``yyyy-MM-qq`` encodes half-month
markers (``q1`` → day 01, ``q2`` → day 16) and is handled with
``regexp_replace`` before ``to_date`` (reference :46-52).

All casts are column expressions — the whole validation is one projection,
so at 100 TB it fuses into the scan's codegen stage and prunes unread
columns.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

QUARTER_FORMAT = "yyyy-MM-qq"


def quarter_to_date(col: Column) -> Column:
    """``yyyy-MM-qq`` → DATE: q1 → day 01, q2 → day 16 (reference :46-52)."""
    replaced = F.regexp_replace(
        F.regexp_replace(col, "q1", "01"), "q2", "16"
    )
    return F.to_date(replaced, "yyyy-MM-dd")


def year_to_date(col: Column) -> Column:
    """Year-only values → ``yyyy-12-01`` (reference outdateness.py:80-90)."""
    ts = F.to_timestamp(col.cast("string"), "yyyy")
    return F.to_date(F.date_format(ts, "yyyy-12-01"))


def cast_column(col: Column, data_type: str, format_source: str | None = None) -> Column:
    """Cast one column per its config entry."""
    if data_type == "date":
        if format_source == QUARTER_FORMAT:
            return quarter_to_date(col)
        if format_source == "yyyy":
            return year_to_date(col)
        if format_source:
            return F.to_date(col, format_source)
        return col.cast("date")
    if data_type == "timestamp" and format_source:
        return F.to_timestamp(col, format_source)
    return col.cast(data_type)


def schemas_validation(
    df: DataFrame,
    columns: Sequence[Mapping[str, str]],
    keep_unlisted: bool = False,
) -> DataFrame:
    """Apply a per-column ``{source, name, data_type, format_source}`` config.

    ``source`` is the raw column (defaults to ``name``); the output column
    is ``name`` cast to ``data_type``. Unlisted columns are dropped unless
    ``keep_unlisted`` (the reference projects exactly the configured set).
    """
    exprs: list[Column] = []
    listed_sources = set()
    for spec in columns:
        source = spec.get("source", spec["name"])
        if source not in df.columns:
            raise ValueError(f"schemas_validation: source column {source!r} missing")
        listed_sources.add(source)
        exprs.append(
            cast_column(F.col(source), spec["data_type"], spec.get("format_source"))
            .alias(spec["name"])
        )
    if keep_unlisted:
        exprs = [F.col(c) for c in df.columns if c not in listed_sources] + exprs
    return df.select(*exprs)


def missing_columns(df: DataFrame, required: Sequence[str]) -> list[str]:
    """MISSING_COLUMNS check (reference monitor.py:283-297)."""
    have = set(df.columns)
    return [c for c in required if c not in have]
