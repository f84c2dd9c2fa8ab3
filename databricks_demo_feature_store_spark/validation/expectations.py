"""Declarative data-quality expectations, checked in one pass.

The Delta-Live-Tables/Great-Expectations shape the reference's validation
tier stops short of: a table-level contract — per-column rules with
thresholds — evaluated as ONE aggregation over the data, emitting one
auditable row per rule with exact violation counts and a pass verdict
(reference context: the hand-rolled per-table checks in
``src/packages/data_validation/monitor.py`` — this generalizes them into
a declarative, composable rule set).

Scale shape: every non-uniqueness rule is a conditional ``sum`` inside a
single global aggregate (map-side combinable — the scan streams once,
state is one counter per rule). Uniqueness rules need COUNT(DISTINCT),
which must NOT share an Aggregate with other expressions beyond counts
(multi-distinct planning expands rows per distinct column); they run in a
second 1-row aggregate crossed with the first, the same split proven out
by ``operators/sketches.sketch_profile_audit``.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


@dataclass(frozen=True)
class Expectation:
    """One rule over one column.

    rule:
      - ``not_null``                   — no NULLs (or ≤ max_fraction)
      - ``unique``                     — no duplicate non-null values
      - ``between``                    — lo ≤ value ≤ hi (NULLs ignored)
      - ``in_set``                     — value ∈ allowed (NULLs ignored)
      - ``matches``                    — value rlike pattern (NULLs ignored)
    ``max_fraction``: allowed violation share (default 0.0 = hard rule).
    """

    column: str
    rule: str
    lo: float | None = None
    hi: float | None = None
    allowed: tuple = field(default_factory=tuple)
    pattern: str | None = None
    max_fraction: float = 0.0

    @property
    def label(self) -> str:
        return f"{self.column}:{self.rule}"


def _violation_col(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.rule == "not_null":
        return c.isNull()
    if e.rule == "between":
        return c.isNotNull() & ~c.between(F.lit(e.lo), F.lit(e.hi))
    if e.rule == "in_set":
        return c.isNotNull() & ~c.isin(list(e.allowed))
    if e.rule == "matches":
        return c.isNotNull() & ~c.rlike(e.pattern)
    raise ValueError(f"unknown expectation rule {e.rule!r}")


def check_expectations(
    df: DataFrame, expectations: Sequence[Expectation]
) -> DataFrame:
    """Evaluate every expectation; one output row per rule:
    ``(column, rule, n_rows, n_violations, violation_fraction, passed)``.

    All scan rules fold into one aggregate; ``unique`` rules run in a
    separate distinct-only aggregate (see module docstring) — two jobs
    total regardless of how many rules the contract holds.
    """
    scan = [e for e in expectations if e.rule != "unique"]
    uniq = [e for e in expectations if e.rule == "unique"]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(scan):
        aggs.append(
            F.sum(_violation_col(e).cast("long")).alias(f"__v_{i}")
        )
    for j, e in enumerate(uniq):
        aggs.append(F.count(F.col(e.column)).alias(f"__un_{j}"))
    one = df.agg(*aggs)
    if uniq:
        ndv = df.agg(
            *[
                F.count_distinct(F.col(e.column)).alias(f"__ud_{j}")
                for j, e in enumerate(uniq)
            ]
        )
        one = one.crossJoin(F.broadcast(ndv))

    rows = []
    for i, e in enumerate(scan):
        rows.append((e, F.col(f"__v_{i}")))
    for j, e in enumerate(uniq):
        rows.append((e, F.col(f"__un_{j}") - F.col(f"__ud_{j}")))

    per_rule = F.array(
        *[
            F.struct(
                F.lit(e.column).alias("column"),
                F.lit(e.rule).alias("rule"),
                F.col("__n").alias("n_rows"),
                v.alias("n_violations"),
                dround(
                    F.when(
                        F.col("__n") > 0, v.cast("double") / F.col("__n")
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("violation_fraction"),
                (
                    F.when(F.col("__n") > 0, v.cast("double") / F.col("__n"))
                    .otherwise(F.lit(0.0))
                    <= F.lit(float(e.max_fraction))
                ).alias("passed"),
            )
            for e, v in rows
        ]
    )
    return one.select(F.explode(per_rule).alias("s")).select("s.*")
