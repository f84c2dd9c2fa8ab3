"""String normalization functions.

Parity targets in the reference:

- ``trim_columns_dataframe`` — ``notebooks/utils.py:441-461``,
  ``src/packages/preprocessing/clean/clean_strings.py:168-189``
- ``_clean_accents`` — ``utils.py:340-379`` (per-accent regexp_replace; we
  use a single-pass ``translate`` which is the idiomatic equivalent)
- ``replace_no_alphanum_dataframe`` — ``utils.py:382-421`` and
  ``clean_strings.py:192-252`` (lowercase → de-accent → trim →
  non-alphanumerics → ``_`` → collapse ``_+`` → strip edge ``_``)
- ``preprocessing_ingesting_tables`` — ``utils.py:464-473``
- ``_standardize_column_names`` — ``clean_strings.py:96-165``
- ``concat_columns`` — ``src/packages/preprocessing/transformers/transform_column.py:11-55``

All implemented with built-in JVM functions (lower/translate/regexp_replace)
so they stay inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

# Same accent map the reference iterates regexp_replace over
# (``notebooks/utils.py:340-379``), flattened for one-pass translate.
_ACCENT_SRC = "áàäâãåéèëêíìïîóòöôõúùüûñçýÿÁÀÄÂÃÅÉÈËÊÍÌÏÎÓÒÖÔÕÚÙÜÛÑÇÝ"
_ACCENT_DST = "aaaaaaeeeeiiiiooooouuuunc" + "yy" + "AAAAAAEEEEIIIIOOOOOUUUUNCY"


def string_columns(df: DataFrame) -> list[str]:
    """Schema scan for StringType fields — ``utils.py:322-337``."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def trim_string_columns(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """``f.trim`` every (or the given) string column — ``utils.py:441-461``."""
    cols = list(columns) if columns is not None else string_columns(df)
    return df.withColumns({c: F.trim(F.col(c)) for c in cols})


def clean_accents_col(col: Column) -> Column:
    """Single-pass accent fold (á→a … Ñ→N) via ``translate``."""
    return F.translate(col, _ACCENT_SRC, _ACCENT_DST)


def clean_accents(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    cols = list(columns) if columns is not None else string_columns(df)
    return df.withColumns({c: clean_accents_col(F.col(c)) for c in cols})


def normalize_string_col(col: Column) -> Column:
    """lowercase → de-accent → trim → non-alnum→``_`` → collapse → strip.

    Reference ``replace_no_alphanum_dataframe`` (``utils.py:382-421``, char
    class at :399) / ``standarize_string_values``
    (``clean_strings.py:255-279``). E.g. ``' Tarjeta de Crédito!! '`` →
    ``'tarjeta_de_credito'``.
    """
    out = clean_accents_col(F.lower(F.trim(col)))
    out = F.regexp_replace(out, r"[^a-z0-9]+", "_")
    out = F.regexp_replace(out, r"_+", "_")
    out = F.regexp_replace(out, r"^_|_$", "")
    return out


def normalize_string_values(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    cols = list(columns) if columns is not None else string_columns(df)
    return df.withColumns({c: normalize_string_col(F.col(c)) for c in cols})


def preprocess_ingested_table(
    df: DataFrame,
    trim_columns: Sequence[str] | None = None,
    normalize_columns: Sequence[str] | None = None,
) -> DataFrame:
    """trim + normalize pipeline applied post-ingestion — ``utils.py:464-473``.

    By default trims all string columns and normalizes none (the reference
    normalizes a per-pipeline subset).
    """
    df = trim_string_columns(df, trim_columns)
    if normalize_columns:
        df = normalize_string_values(df, normalize_columns)
    return df


def _normalize_name(name: str) -> str:
    folded = (
        unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode("ascii")
    )
    folded = re.sub(r"[^A-Za-z0-9]+", "_", folded.strip().lower())
    return re.sub(r"_+", "_", folded).strip("_")


def standardize_column_names(df: DataFrame) -> DataFrame:
    """Driver-side unidecode/snake-case of COLUMN NAMES — ``clean_strings.py:96-165``."""
    renames = {c: _normalize_name(c) for c in df.columns if c != _normalize_name(c)}
    return df.withColumnsRenamed(renames) if renames else df


def concat_columns(
    df: DataFrame,
    new_column: str,
    parts: Sequence[str],
    literals_prefix: str = "lit:",
    separator: str = "",
) -> DataFrame:
    """``f.concat`` of columns and/or literals — ``transform_column.py:11-55``.

    Parts starting with ``lit:`` are treated as literal strings.
    """
    cols: list[Column] = []
    for p in parts:
        cols.append(F.lit(p[len(literals_prefix):]) if p.startswith(literals_prefix) else F.col(p).cast("string"))
    if separator:
        expr = F.concat_ws(separator, *cols)
    else:
        expr = F.concat(*cols)
    return df.withColumn(new_column, expr)


def sql_string_literal(value: str) -> str:
    """Escape ``value`` for interpolation into a Spark SQL single-quoted
    string literal (backslash-escape ``\\`` and ``'``). Use whenever a
    caller-supplied name is spliced into an ``F.expr`` string — a column
    named ``it's`` must not break the parse."""
    return value.replace("\\", "\\\\").replace("'", "\\'")


def sql_identifier(name: str) -> str:
    """Quote ``name`` as a backticked Spark SQL identifier, escaping
    embedded backticks by doubling them (the Spark/Hive rule)."""
    return "`" + name.replace("`", "``") + "`"
