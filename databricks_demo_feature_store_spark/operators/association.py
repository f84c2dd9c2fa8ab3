"""Market-basket association mining: frequent item pairs with
support / confidence / lift.

The classic co-occurrence analysis over any (basket, item) relation —
orders×parts, user×features, document×entities. A-priori pruned to stay
shuffle-bounded at 100 TB: an item below min-support can't appear in a
frequent pair (monotonicity), so the per-basket pair expansion only ever
sees the pruned item set, and the optional basket cap bounds the m² blow
up of pathological baskets (a bot cart with 10k items).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
    max_items_per_basket: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Frequent item pairs: one row per unordered pair that co-occurs in
    at least ``min_support_count`` baskets —
    ``(item_a, item_b, n_pair, n_a, n_b, support, confidence, lift)``
    with ``item_a < item_b``, ``support = n_pair / n_baskets``,
    ``confidence = n_pair / n_a`` (the a→b rule; swap roles for b→a),
    ``lift = n_pair · n_baskets / (n_a · n_b)`` (> 1 = attract,
    < 1 = repel). Duplicate (basket, item) rows collapse first — support
    counts baskets, not line items.

    Plan: item-support aggregation → A-priori prune (items below
    min-support can't form a frequent pair, so they exit BEFORE the
    quadratic step) → basket self-join on the pruned items → pair
    count → broadcast margin join. ``max_items_per_basket`` drops
    baskets larger than the cap entirely (size from one count
    aggregation) — the documented guard against m² expansion of
    degenerate baskets; dropped baskets are excluded from n_baskets so
    the support denominator stays consistent.
    """
    if min_support_count < 1:
        raise ValueError("frequent_pairs requires min_support_count >= 1")
    b = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).where(F.col("__b").isNotNull() & F.col("__i").isNotNull()).distinct()
    if max_items_per_basket is not None:
        if max_items_per_basket < 2:
            raise ValueError("max_items_per_basket must be >= 2")
        sizes = b.groupBy("__b").agg(F.count("*").alias("__sz"))
        b = b.join(
            sizes.where(F.col("__sz") <= int(max_items_per_basket)).select("__b"),
            "__b",
        )
    n_baskets = b.select("__b").distinct().agg(F.count("*").alias("__nb"))
    item_support = b.groupBy("__i").agg(F.count("*").alias("__n_item"))
    frequent_items = item_support.where(
        F.col("__n_item") >= int(min_support_count)
    )
    pruned = b.join(
        frequent_items.select("__i"), "__i"
    ).select("__b", "__i")
    pairs = (
        pruned.alias("l")
        .join(pruned.alias("r"), "__b")
        .where(F.col("l.__i") < F.col("r.__i"))
        .groupBy(
            F.col("l.__i").alias("item_a"), F.col("r.__i").alias("item_b")
        )
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= int(min_support_count))
    )
    sup_a = frequent_items.select(
        F.col("__i").alias("item_a"), F.col("__n_item").alias("n_a")
    )
    sup_b = frequent_items.select(
        F.col("__i").alias("item_b"), F.col("__n_item").alias("n_b")
    )
    nb = F.col("__nb").cast("double")
    return (
        pairs.join(F.broadcast(sup_a), "item_a")
        .join(F.broadcast(sup_b), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            dround(F.col("n_pair").cast("double") / nb, round_to).alias("support"),
            dround(
                F.col("n_pair").cast("double") / F.col("n_a").cast("double"),
                round_to,
            ).alias("confidence"),
            dround(
                F.col("n_pair").cast("double")
                * nb
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                round_to,
            ).alias("lift"),
        )
    )
