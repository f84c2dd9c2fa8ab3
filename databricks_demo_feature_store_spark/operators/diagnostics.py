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


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """EXACT inner-equi-join output size WITHOUT running the join:
    ``|A ⋈ B| = Σ_k count_A(k) · count_B(k)`` — two per-key count
    aggregations (map-side combined) and one join of COUNT frames
    (distinct keys, never rows). One summary row:
    ``(join_rows, left_rows, right_rows, matched_keys, amplification,
    top_key, top_key_rows, top_key_share)`` — ``amplification`` =
    output/input tells you whether the join explodes; ``top_key_share``
    tells you whether ONE key dominates the output (the straggler that
    AQE skew-split or `salted_join` must handle). NULL keys never match
    (SQL semantics) but their rows still count toward the input totals.

    Run this BEFORE a 100 TB fact-fact join: the estimate costs two
    shuffles of (key, count) pairs; the mistake it prevents costs the
    cluster.
    """
    rk = right_key or left_key
    # group on the RAW key (NULL group included) so the match join below
    # gets Spark's own type coercion — exactly what the real join would
    # do; a stringified compare would miss DOUBLE-vs-BIGINT matches the
    # real join makes. NULLs never equi-join, so the NULL groups simply
    # don't match; their rows still count toward the totals.
    lc = left.groupBy(F.col(left_key).alias("__kl")).agg(
        F.count(F.lit(1)).alias("__nl")
    )
    rc = right.groupBy(F.col(rk).alias("__kr")).agg(
        F.count(F.lit(1)).alias("__nr")
    )
    dec = "decimal(38,0)"
    prod = (F.col("__nl").cast(dec) * F.col("__nr").cast(dec)).alias("__out")
    pairs = lc.join(rc, F.col("__kl") == F.col("__kr")).select(
        F.col("__kl").cast("string").alias("key"), "__nl", "__nr", prod
    )
    totals = pairs.agg(
        F.sum("__out").alias("__join_rows"),
        F.count(F.lit(1)).alias("__matched"),
        F.max_by(
            F.struct(
                F.col("key").alias("k"),
                F.col("__out").alias("o"),
            ),
            F.struct(F.col("__out").alias("o"), F.col("key").alias("k")),
        ).alias("__top"),
    )
    # total rows come from the count frames already computed — no second
    # full scan of either raw table
    lt = lc.agg(F.coalesce(F.sum("__nl"), F.lit(0)).alias("__lrows"))
    rt = rc.agg(F.coalesce(F.sum("__nr"), F.lit(0)).alias("__rrows"))
    out = totals.crossJoin(F.broadcast(lt)).crossJoin(F.broadcast(rt))
    join_rows = F.coalesce(F.col("__join_rows"), F.lit(0).cast(dec))
    denom = (F.col("__lrows") + F.col("__rrows")).cast("double")
    return out.select(
        # internal arithmetic stays DECIMAL(38); the reported count is a
        # long (exact up to 2^63 output rows — beyond that the join
        # should not be run anyway)
        join_rows.cast("long").alias("join_rows"),
        F.col("__lrows").cast("long").alias("left_rows"),
        F.col("__rrows").cast("long").alias("right_rows"),
        F.col("__matched").cast("long").alias("matched_keys"),
        dround(
            F.when(denom > 0, join_rows.cast("double") / denom), round_to
        ).alias("amplification"),
        F.col("__top.k").alias("top_key"),
        F.coalesce(F.col("__top.o"), F.lit(0).cast(dec)).cast("long").alias("top_key_rows"),
        dround(
            F.when(
                join_rows.cast("double") > 0,
                F.col("__top.o").cast("double") / join_rows.cast("double"),
            ),
            round_to,
        ).alias("top_key_share"),
    )


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
