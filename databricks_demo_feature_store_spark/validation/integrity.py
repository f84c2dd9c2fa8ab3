"""Data-integrity screens for training/feature data: re-identification
risk (k-anonymity / l-diversity) and fabricated-number detection
(Benford first-digit deviation).

These extend the reference's validation surface (``src/packages/
data_validation/``, which stops at schema/count/freshness checks) with
the audits a team shipping TRAINING data runs before release: the
privacy audit is the Sweeney k-anonymity / Machanavajjhala l-diversity
check over quasi-identifier combinations, and the Benford screen is the
classic forensic test for synthetic or hand-edited numeric columns.

Scale shape: both collapse the data to group-count frames in one hash
aggregation (map-side combined) and never shuffle raw rows; the privacy
summary is a second aggregate over the group frame (group-cardinality
sized, not row sized). All outputs are exact integers or one-division
ratios routed through :func:`dround` — cross-engine reproducible.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround

__all__ = ["privacy_audit", "privacy_risk_groups", "benford_deviation"]


def privacy_risk_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """The VIOLATING quasi-identifier groups: every combination of
    ``quasi_cols`` values whose group is smaller than ``k`` rows
    (re-identifiable) or — when ``sensitive_col`` is given — carries
    fewer than ``l`` distinct sensitive values (attribute-disclosing).
    Columns: the quasi identifiers + ``(group_size, n_sensitive,
    k_violation, l_violation)``. Review output; row-count bounded by the
    number of small groups, not the data.
    """
    if not quasi_cols:
        raise ValueError("privacy_risk_groups requires >= 1 quasi column")
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    else:
        aggs.append(F.lit(None).cast("long").alias("n_sensitive"))
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    k_viol = F.col("group_size") < int(k)
    l_viol = (
        F.col("n_sensitive") < int(l)
        if sensitive_col is not None
        else F.lit(False)
    )
    return (
        g.select(
            *quasi_cols,
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_sensitive").cast("long").alias("n_sensitive"),
            k_viol.alias("k_violation"),
            l_viol.alias("l_violation"),
        )
        .where(k_viol | l_viol)
    )


def privacy_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """One-row k-anonymity / l-diversity summary over the quasi-identifier
    combination: ``(n_rows, n_groups, min_group_size, n_k_violating_groups,
    rows_at_risk, risk_share, min_l_diversity, n_l_violating_groups)``.

    A dataset is k-anonymous at ``k`` iff ``min_group_size >= k`` (no
    quasi-identifier combination isolates fewer than k people), and
    l-diverse at ``l`` iff every group carries >= l distinct sensitive
    values. ``rows_at_risk`` counts the rows living in sub-k groups;
    ``risk_share`` divides by the total row count (one IEEE division).
    """
    if not quasi_cols:
        raise ValueError("privacy_audit requires >= 1 quasi column")
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    k_viol = F.col("group_size") < int(k)
    summary = [
        F.sum("group_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("group_size").cast("long").alias("min_group_size"),
        F.sum(k_viol.cast("long")).cast("long").alias("n_k_violating_groups"),
        F.sum(F.when(k_viol, F.col("group_size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
    ]
    if sensitive_col is not None:
        l_viol = F.col("n_sensitive") < int(l)
        summary += [
            F.min("n_sensitive").cast("long").alias("min_l_diversity"),
            F.sum(l_viol.cast("long")).cast("long").alias("n_l_violating_groups"),
        ]
    else:
        summary += [
            F.lit(None).cast("long").alias("min_l_diversity"),
            F.lit(None).cast("long").alias("n_l_violating_groups"),
        ]
    out = g.agg(*summary)
    return out.select(
        "n_rows",
        "n_groups",
        "min_group_size",
        "n_k_violating_groups",
        "rows_at_risk",
        dround(
            F.col("rows_at_risk").cast("double") / F.col("n_rows").cast("double"),
            round_to,
        ).alias("risk_share"),
        "min_l_diversity",
        "n_l_violating_groups",
    )


def benford_deviation(
    df: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Benford first-digit screen over a positive numeric column: one row
    per leading digit 1-9 with ``(digit, n, observed_share,
    expected_share, abs_deviation)`` — the forensic test for fabricated,
    truncated, or unit-mangled numeric data (natural multi-magnitude
    quantities follow ``P(d) = log10(1 + 1/d)``).

    The leading digit is extracted from the STRING form of the value
    (first character in [1-9]) — decimal-typed columns render identical
    digit strings in Spark and DuckDB, so the digit assignment is
    engine-exact, unlike ``floor(x / 10^floor(log10 x))`` which flips at
    exact powers of ten under 1-ulp libm drift. Expected shares are
    Python-computed constants injected as literals (the same doubles on
    both sides). Rows with NULL/zero/negative values are excluded — run
    the screen per sign regime.
    """
    digit = F.regexp_extract(
        F.abs(F.col(value_col)).cast("string"), "[1-9]", 0
    )
    base = df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
    counts = (
        base.select(digit.alias("digit"))
        .where(F.col("digit") != "")
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__tot"))
    expected = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(str(d)), F.lit(math.log10(1.0 + 1.0 / d)))
        ]
    )
    obs = F.col("n").cast("double") / F.col("__tot").cast("double")
    exp = expected[F.col("digit")]
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("long").alias("n"),
            dround(obs, round_to).alias("observed_share"),
            dround(exp, round_to).alias("expected_share"),
            dround(F.abs(dround(obs, round_to) - dround(exp, round_to)), round_to).alias(
                "abs_deviation"
            ),
        )
    )
