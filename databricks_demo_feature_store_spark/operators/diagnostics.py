"""Plan-tuning diagnostics: key-distribution skew profiling.

Before co-partitioning a 100 TB join you want to KNOW whether the key is
skewed (one hot key = one straggler task = the whole stage's wall time),
how hot the hottest keys are, and whether salting / AQE skew-split is
worth wiring in. This is the measurement step behind the engine's
`salted_join` knob — measure, don't guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Skew report for a join/aggregation key: the ``top_n`` hottest
    keys with their row share, plus distribution-level summary columns
    repeated on every row — ``total_rows``, ``distinct_keys``,
    ``max_share`` (straggler bound: the hottest key's fraction ends up
    in ONE task of a co-partitioned join), and ``balance`` = entropy /
    ln(distinct_keys) ∈ (0, 1] (1 = perfectly uniform; low = salt it).
    NULL keys profile under '__null__' — NULL-heavy keys are the most
    common real-world skew.

    Shape: one count aggregation on the key (map-side combined), two
    tiny aggregates over the per-key counts for the summary, and a
    TakeOrdered ``top_n`` — never a full sort, never a collect.
    """
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("__null__"))
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__k"),
        F.max("n_rows").alias("__max"),
    )
    p = F.col("n_rows").cast("double") / F.col("__total").cast("double")
    ent = (
        counts.crossJoin(F.broadcast(tot))
        .agg(F.sum(-p * F.log(p)).alias("__entropy"))
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(
        int(top_n)
    )
    from pyspark.sql import Window as W

    # rank DIRECTLY over the already-limited (≤ top_n rows) frame, before
    # the summary joins, so the only unpartitioned window sits on a
    # bounded input
    top = top.select(
        F.row_number()
        .over(W.orderBy(F.col("n_rows").desc(), F.col("key").asc()))
        .alias("rank"),
        "key",
        "n_rows",
    )
    out = top.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ent))
    share = F.col("n_rows").cast("double") / F.col("__total").cast("double")
    balance = F.when(
        F.col("__k") > 1,
        F.col("__entropy") / F.log(F.col("__k").cast("double")),
    ).otherwise(F.lit(1.0))
    return out.select(
        "rank",
        "key",
        "n_rows",
        dround(share, round_to).alias("share"),
        F.col("__total").cast("long").alias("total_rows"),
        F.col("__k").cast("long").alias("distinct_keys"),
        dround(
            F.col("__max").cast("double") / F.col("__total").cast("double"),
            round_to,
        ).alias("max_share"),
        dround(balance, round_to).alias("balance"),
    )
