"""Deterministic rounding for double-typed feature values.

``F.round`` on a DOUBLE rounds the value's shortest decimal representation
(JVM ``BigDecimal.valueOf``) HALF_UP, which disagrees with engines that
round the binary value (e.g. 160954.70375 stored as 160954.703749999…)
whenever a value sits on a rounding boundary — and with money-like inputs
(2-decimal amounts divided by small integers) boundaries are *common*, not
rare. Routing through DECIMAL first makes the rounding well-defined and
engine-independent: cast the double to DECIMAL(38,10) (both Spark and
DuckDB preserve the shortest-repr value), then round in decimal arithmetic
(HALF_UP in both), then cast back to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dround(col: Column | str, scale: int = 4) -> Column:
    """Deterministic HALF_UP rounding of a double via decimal arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(38,10)"), scale).cast("double")


def oracle_dround(expr: str, scale: int = 4) -> str:
    """The DuckDB-SQL twin of :func:`dround` for oracle queries."""
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(38,10)), {scale}) AS DOUBLE)"
