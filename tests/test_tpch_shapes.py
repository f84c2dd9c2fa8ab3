"""Property tests for the TPC-H completion tier's subquery rewrites
(queries_tpch.py): each decorrelated Spark form is pinned against the
LITERAL correlated form, executed in Spark itself on the sf0.001 tables —
independent of the DuckDB gate, so a rewrite bug can't hide behind an
oracle that was adapted the same way.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from databricks_demo_feature_store_spark.queries import load
from databricks_demo_feature_store_spark.queries_tpch import (
    q02_min_cost_supplier,
    q13_order_distribution,
    q21_sole_return_suppliers,
)

SF = "/root/testdata/sf0.001"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_q21_aggregate_splice_equals_literal_double_self_join(spark):
    """The per-order (n_suppliers, n_r_suppliers) splice must reproduce the
    literal EXISTS + NOT EXISTS double self-join row-for-row."""
    l = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, SF, "supplier")

    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    # EXISTS: another supplier in the same order
    other = l.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    ).distinct()
    exists = l1.join(
        other,
        (F.col("l_orderkey") == F.col("__ok2")) & (F.col("l_suppkey") != F.col("__sk2")),
        "left_semi",
    )
    # NOT EXISTS: another supplier who also returned in the same order
    other_r = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3"))
        .distinct()
    )
    literal = (
        exists.join(
            other_r,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "left_anti",
        )
        .join(
            o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .join(s.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    got = q21_sole_return_suppliers(spark, SF).select("s_name", "numwait")
    assert rows(got) == rows(literal.orderBy(F.desc("numwait"), "s_name").limit(100))


def test_q02_window_min_keeps_all_ties(spark):
    """Two suppliers sharing the per-part minimum balance must BOTH survive
    the equality filter (the correlated-MIN subquery keeps ties)."""
    cand = spark.createDataFrame(
        [
            (1, 10.0, "s_a", "N_1", "widget"),
            (1, 10.0, "s_b", "N_2", "widget"),
            (1, 12.0, "s_c", "N_1", "widget"),
            (2, 5.0, "s_a", "N_1", "bolt"),
        ],
        "p_partkey int, s_acctbal double, s_name string, n_name string, p_name string",
    )
    w = W.partitionBy("p_partkey")
    out = (
        cand.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min_bal"))
        .select("p_partkey", "s_name")
    )
    assert rows(out) == [(1, "s_a"), (1, "s_b"), (2, "s_a")]
    # and on real data: every returned part carries its true minimum
    full = q02_min_cost_supplier(spark, SF)
    bad = (
        full.groupBy("p_partkey")
        .agg(F.countDistinct("s_acctbal").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert bad.count() == 0


def test_q13_on_clause_predicate_keeps_zero_order_customers(spark):
    """The priority exclusion lives in the JOIN's ON clause: a customer
    whose every order is excluded must appear in the c_count=0 bucket,
    not vanish (the WHERE form would drop them)."""
    dist = {r["c_count"]: r["custdist"] for r in q13_order_distribution(spark, SF).collect()}
    c = load(spark, SF, "customer")
    o = load(spark, SF, "orders")
    # customers with ≥1 order but none outside the excluded priority
    only_excluded = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("all_orders"),
            F.count(
                F.when(F.col("o_orderpriority") != "4-NOT SPECIFIED", F.lit(1))
            ).alias("kept_orders"),
        )
    )
    expected_zero = only_excluded.filter(F.col("kept_orders") == 0).count()
    assert dist.get(0, 0) == expected_zero
    assert sum(dist.values()) == c.count()


def test_pushdown_ratchet_detects_hidden_predicates(spark):
    """The audit's PushedFilters check must distinguish a scan-pushed
    predicate from one hidden behind a non-pushable expression."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from explain_audit import has_nonempty_pushed_filters

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pushed = li.filter(F.col("l_quantity") < 10)
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert has_nonempty_pushed_filters(plan)
    # a UDF-wrapped predicate cannot push — the checker must say so
    from pyspark.sql.types import BooleanType
    from pyspark.sql.functions import udf

    hide = udf(lambda q: q is not None and q < 10, BooleanType())
    hidden = li.filter(hide(F.col("l_quantity")))
    plan2 = hidden._jdf.queryExecution().executedPlan().toString()
    assert not has_nonempty_pushed_filters(plan2)
