"""Empirical scale validation: materialize a deterministic 10× slice of
the heavy tables (documents / embeddings / events / orders), run the
heaviest registered queries at 1× (sf0.1) and at 10×, and report the
per-query scaling exponent  log(t_10x / t_1x) / log(10)  — 1.0 is
linear, <1 means fixed overheads still dominate, >1.1 is super-linear
and a scale bug.

The 10× tables keep each copy STATISTICALLY INDEPENDENT of the others so
the workload's character is preserved (10× more documents, not 10×
bigger duplicate clusters):

- documents: per-copy alphabet rotation of the text (a deterministic
  `translate`), so shingles/fingerprints of different copies never
  collide; doc_id offset per copy.
- embeddings: per-(copy, position) hash sign-flips on the vector
  (preserves norms, decorrelates every copy from every other), vec_id
  offset.
- events / orders: id offsets per copy (10× more users / customers with
  the same per-entity activity shape).

Every other table is copied as-is. Timing = min of 2 after one discarded
warm-up run (plan + JIT), sink = noop writer (no driver collect).

Usage: python tools/scaling_run.py [--queries q1,q2] [--factor 10]
Writes JSON to stdout; paste the table into SCALING.md §"Empirical 10×
scaling".
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "q_ext_dedup_keep_best",
    "q_ext_dedup_clusters",
    "q_ext_dedup_clusters_twophase",
    "q_ext_minhash_dedup",
    "q_ext_simhash_pairs",
    "q_ext_substring_dedup",
    "q_ext_semantic_dedup",
    "q_ext_ivfpq_topk",
    "q_ext_pq_adc_topk",
    "q_ext_dsir_weights",
    "q_funnel_steps",
    "q_retention_cohorts",
    "q_quantile_bin",
    # round-9 additions (VERDICT r8 task 4): the two round-8 families
    # with super-constant risk — grouping-sets' Expand fan-out and the
    # clustering coefficient's wedge join — plus the single-rank RFM
    # rewrite and the 5-lookup training-set composite
    "q_grouping_sets",
    "q_clustering_coeff",
    "q_rfm_segments",
    "q_training_set_stress",
    # late round-9 families with super-constant risk: transitive-closure
    # linkage, hash-slot negatives vs a 10× item dim, the version-diff
    # refresh, and the per-feature skew audit
    "q_golden_records",
    "q_negative_samples",
    "q_training_set_refresh",
    "q_val_serving_skew",
    # round-10 additions (VERDICT r9 task 4): the late-round-9 families
    # that had exchange budgets but no exponent rows...
    "q_cms_frequencies",
    "q_stream_cms",
    "q_store_doctor",
    "q_store_lineage",
    "q_position_attribution",
    "q_conversion_lags",
    "q_json_extract",
    "q_json_schema_drift",
    "q_purged_folds",
    "q_stream_ingest_multibatch",
    # ...and the round-10 births (TPC-H planner trio joins the scaled
    # supplier dim; CDC / as-of / SCD2 are new machinery)
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q_cdc_apply_changes",
    "q_asof_nearest",
    "q_scd2_dim_join",
    "q_trailing_features",
    "q_trailing_multi_window",
    "q_label_window",
    "q_incr_agg_refresh",
    "q_stream_cdc_apply",
    "q_ext_filtered_ann",
    "q_ext_semantic_contamination",
    "q_training_set_windowed",
    "q_event_paths",
]

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_scaled_dir(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    copies = spark.range(factor).select(F.col("id").cast("int").alias("__c"))

    def _expand(name):
        return (
            spark.read.parquet(os.path.join(src, f"{name}.parquet"))
            .crossJoin(F.broadcast(copies))
        )

    # documents: rotate the alphabet per copy so copies share no shingles
    d = _expand("documents")
    rotations = [ALPHA[i % 26:] + ALPHA[: i % 26] for i in range(factor)]
    text = F.col("text")
    for i in range(1, factor):
        text = F.when(
            F.col("__c") == i,
            F.translate(F.col("text"), ALPHA + ALPHA.upper(),
                        rotations[i] + rotations[i].upper()),
        ).otherwise(text)
    d.select(
        (F.col("doc_id") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))

    # embeddings: per-(copy, position) HASH sign-flip — norm-preserving
    # decorrelation that is non-periodic in the copy index (a (pos+copy)%2
    # pattern would make copies 0,2,4,… exact duplicates and grow
    # duplicate CLUSTERS instead of corpus size)
    e = _expand("embeddings")
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            F.pmod(F.xxhash64(F.col("__c"), i), F.lit(2)) == 0, x
        ).otherwise(-x).cast("float"),
    )
    e.select(
        (F.col("vec_id") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("vec_id"),
        flipped.alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))

    ev = _expand("events")
    ev.select(
        (F.col("event_id") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(os.path.join(dst, "events.parquet"))

    o = _expand("orders")
    o.select(
        (F.col("o_orderkey") + F.col("__c").cast("long") * F.lit(100_000_000)).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(dst, "orders.parquet"))

    # lineitem: offsets CONSISTENT with orders (same 100M orderkey step)
    # so order⋈lineitem families join across every copy; part AND
    # supplier dimension keys offset with the same 10M step below so
    # lineitem⋈part / lineitem⋈supplier joins keep their 1× match rate
    # (round-10 fix: supplier used to be copied as-is, silently losing
    # (factor-1)/factor of supplier-dim matches) and graph families
    # (supplier co-occurrence wedge join) get 10× nodes+edges, not a
    # replayed 1× graph (round-9 fix)
    li = _expand("lineitem")
    li.select(
        (F.col("l_orderkey") + F.col("__c").cast("long") * F.lit(100_000_000)).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ).write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))

    # customer: custkey offset matches orders' o_custkey step so
    # customer⋈orders families (static feature tables, spines) scale
    c = _expand("customer")
    c.select(
        (F.col("c_custkey") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("c_custkey"),
        *[col for col in c.columns if col not in ("c_custkey", "__c")],
    ).write.mode("overwrite").parquet(os.path.join(dst, "customer.parquet"))

    # part: key offset + per-copy alphabet-rotated names (same trick as
    # documents) so name-linkage / golden-record / negative-sampling
    # families see 10× entities with 10 disjoint name spaces, not a
    # replayed 1× dimension (round-9 fix)
    p = _expand("part")
    pname = F.col("p_name")
    for i in range(1, factor):
        pname = F.when(
            F.col("__c") == i,
            F.translate(F.col("p_name"), ALPHA + ALPHA.upper(),
                        rotations[i] + rotations[i].upper()),
        ).otherwise(pname)
    p.select(
        (F.col("p_partkey") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("p_partkey"),
        pname.alias("p_name"),
        "p_brand",
        "p_type",
        "p_size",
        "p_retailprice",
    ).write.mode("overwrite").parquet(os.path.join(dst, "part.parquet"))

    # supplier: s_suppkey offset matches lineitem's l_suppkey step (and
    # s_nationkey stays as-is — nation/region are fixed reference dims)
    s = _expand("supplier")
    s.select(
        (F.col("s_suppkey") + F.col("__c").cast("long") * F.lit(10_000_000)).alias("s_suppkey"),
        "s_name",
        "s_nationkey",
        "s_acctbal",
    ).write.mode("overwrite").parquet(os.path.join(dst, "supplier.parquet"))

    for name in ("region", "nation"):
        src_file = os.path.join(src, f"{name}.parquet")
        if os.path.exists(src_file):
            shutil.copy(src_file, os.path.join(dst, f"{name}.parquet"))


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    def once() -> float:
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    once()  # warm-up: plan + JIT, discarded
    return min(once() for _ in range(runs))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEAVY))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    import __spark_entry__ as entry_mod
    from databricks_demo_feature_store_spark import get_spark

    spark = get_spark("scaling-run")
    qs = entry_mod.queries()
    scaled = tempfile.mkdtemp(prefix=f"scale{args.factor}x_")
    try:
        t0 = time.monotonic()
        build_scaled_dir(spark, args.base, scaled, args.factor)
        print(f"built {args.factor}x dir in {time.monotonic() - t0:.1f}s",
              file=sys.stderr)

        results = {}
        for name in names:
            if name not in qs:
                print(f"skip unknown {name}", file=sys.stderr)
                continue
            t1 = time_query(qs[name], spark, args.base)
            t10 = time_query(qs[name], spark, scaled)
            exp = math.log(t10 / t1) / math.log(args.factor)
            results[name] = {
                "t_1x_sec": round(t1, 2),
                f"t_{args.factor}x_sec": round(t10, 2),
                "exponent": round(exp, 2),
            }
            print(f"{name}: {t1:.2f}s -> {t10:.2f}s  exponent={exp:.2f}",
                  file=sys.stderr)
        print(json.dumps({"factor": args.factor, "results": results}))
        return 0
    finally:
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
