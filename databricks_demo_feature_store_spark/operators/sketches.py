"""Approximate/sketch aggregates: HLL distinct counts, approximate
quantiles, frequent items.

At 100 TB exact NDV / exact percentiles need a full shuffle of the key
set; sketches are the standard answer: fixed-size state, map-side partial
aggregation, and (for HLL) MERGEABLE registers — a day's sketch can be
stored and unioned with other days without rescanning. All built-ins run
JVM-side (DataSketches HLL, KLL-style quantile digests); no Python.

Accuracy is engine-specific (approximate by definition), so these
operators are verified by error-bound tests against exact answers
(``tests/test_sketches.py``) and surface as a rows-only gate query rather
than a value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def sketch_profile(
    df: DataFrame,
    columns: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    rsd: float = 0.02,
    accuracy: int = 2_000,
) -> DataFrame:
    """One row per column: approximate NDV + approximate quantiles.

    ``approx_count_distinct`` (HLL++, relative error ``rsd``) and
    ``percentile_approx`` — both single-pass, fixed-memory, partial-agg
    friendly. One global aggregate (a few KB of state per column), then
    an explode to rows — no second scan.

    ``accuracy`` is the percentile sketch's rank-error knob (error ≈
    1/accuracy): 2 000 → 0.05 % rank error, far inside this profile's
    advertised bounds, at ~5× less per-partition summary state to build
    and merge than Spark's 10 000 default — the merge step is what shows
    up at wide parallelism.
    """
    aggs = []
    for c in columns:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"__ndv_{c}"))
        aggs.append(
            F.percentile_approx(
                F.col(c).cast("double"), list(quantiles), accuracy
            ).alias(f"__q_{c}")
        )
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__ndv_{c}").alias("approx_ndv"),
                F.col(f"__n_{c}").alias("n_rows"),
                *[
                    dround(F.col(f"__q_{c}")[i], 6).alias(f"q{int(q * 100):02d}")
                    for i, q in enumerate(quantiles)
                ],
            )
            for c in columns
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")


def hll_sketch(df: DataFrame, key_cols: Sequence[str], value_col: str) -> DataFrame:
    """Per-group DataSketches HLL sketch of ``value_col`` — the MERGEABLE
    form: store the binary sketch per partition/day, union later with
    :func:`hll_merge` instead of rescanning history."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string")).alias("hll")
    )


def hll_merge(sketches: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Union pre-computed HLL sketches (e.g. daily) up to ``key_cols`` and
    estimate the merged distinct count."""
    return (
        sketches.groupBy(*key_cols)
        .agg(F.hll_union_agg("hll").alias("hll"))
        .select(*key_cols, F.hll_sketch_estimate("hll").alias("approx_ndv"))
    )


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.01, max_items: int = 100
) -> DataFrame:
    """Heavy hitters: values whose share of non-null rows ≥ ``min_share``.

    Exact two-aggregate form (count per value → filter by share → top by
    count), fully lazy: the total row count is a one-row aggregate
    broadcast back, never a driver action. A groupBy on the value column —
    with AQE skew handling this is the right call even at 100 TB because
    the OUTPUT is bounded; a count-min sketch only becomes necessary when
    the key cardinality makes the first aggregate itself infeasible, which
    partial aggregation prevents for heavy-hitter-dominated corpora."""
    nn = df.where(F.col(col).isNotNull())
    total = nn.agg(F.count("*").alias("__total"))
    return (
        nn.groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.col("__total") * F.lit(min_share))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(max_items)
        .select(
            "value", "cnt", dround(F.col("cnt") / F.col("__total"), 6).alias("share")
        )
    )
