"""Deterministic sampling and packing operators for training-data
curation: stratified corpus downsampling and token-budget sharding.

Net-new vs the reference (it has no corpus-curation surface); these are
the standard steps between dedup/quality-filter and tokenizer sharding
in a large-scale LLM data pipeline.

Design for 100 TB:

- Sampling is a **pure filter** on a deterministic per-row hash — no
  shuffle, no rand() (reruns, retried tasks, and other engines all pick
  the SAME rows; Bernoulli `rand()` sampling is not reproducible across
  retries and cannot be oracle-checked).
- Sharding is one window over (partition, order) — a single sort
  exchange, the same discipline as the feature windows.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.textops.dedup import portable_hash_col

# Hash-bucket resolution for sampling rates: rates are quantized to
# 1/RESOLUTION so the keep-predicate compares integers (no float edge).
RESOLUTION = 1_000_000


def sample_bucket_col(key: Column, seed: int | str = 0) -> Column:
    """Deterministic bucket in [0, RESOLUTION) from the portable 60-bit
    hash of the row key — the same row lands in the same bucket in any
    engine, on any rerun."""
    return F.pmod(portable_hash_col(key.cast("string"), seed), F.lit(RESOLUTION))


def deterministic_stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int | str = 0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    ``rates`` maps stratum value → sampling fraction (e.g. downweight
    over-represented languages/sources). Unlisted strata use
    ``default_rate``. Expected kept fraction per stratum equals the rate
    to within 1/RESOLUTION; the selection is exactly reproducible.
    """
    threshold = F.lit(int(default_rate * RESOLUTION))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * RESOLUTION))
        ).otherwise(threshold)
    return df.where(sample_bucket_col(F.col(key_col), seed) < threshold)


def token_budget_shards(
    df: DataFrame,
    token_col: str,
    partition_col: str,
    order_col: str,
    budget: int = 2048,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign consecutive docs (by ``order_col`` within ``partition_col``)
    to shards of ~``budget`` tokens: shard = floor(tokens-before / budget).

    This is the streaming-friendly form of sequence packing for training
    batches — one window (single sort exchange), no driver loop, and a
    doc spilling over a boundary starts the next shard (shards can
    overshoot by at most one doc, they never undershoot).
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn("cum_tokens", cum).withColumn(
        shard_col,
        F.floor((F.col("cum_tokens") - F.col(token_col)) / F.lit(budget)).cast("int"),
    )


def token_budget_mixture(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    key_col: str,
    budgets: Mapping[str, int],
    seed: int | str = 0,
) -> DataFrame:
    """Data-mixture sampling: keep documents per stratum (source, domain,
    language, …) until that stratum's TOKEN budget is filled — the
    standard "mix N billion tokens of web with M billion of code" recipe,
    as a deterministic operator.

    Docs are ordered inside each stratum by their sample-bucket hash (a
    deterministic shuffle — no rand(), so reruns and other engines pick
    the same docs) and kept while the running token total BEFORE the doc
    is under the stratum's budget — so budgets can overshoot by at most
    one document, never undershoot while eligible docs remain (same
    boundary rule as :func:`token_budget_shards`). Unlisted strata are
    dropped.

    One window (single sort exchange on the stratum key); strata are the
    window partitions, so the 100 TB failure mode is a single giant
    stratum — pre-split such strata on a salted sub-key and give each
    split ``budget / n_splits``.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(sample_bucket_col(F.col(key_col).cast("string"), seed), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(None).cast("long")
    for stratum, b in budgets.items():
        budget = F.when(F.col(strata_col) == stratum, F.lit(int(b))).otherwise(budget)
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return (
        df.withColumn("__budget", budget)
        .withColumn("__cum_before", cum_before)
        .where(F.col("__budget").isNotNull() & (F.col("__cum_before") < F.col("__budget")))
        .drop("__budget", "__cum_before")
    )
