"""Distributed hashed-linear training pinned against a sequential pure-
Python replay (same DECIMAL discipline), plus a does-it-learn check."""

from __future__ import annotations

import collections
import decimal
import math

from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.queries import load
from databricks_demo_feature_store_spark.textops.analysis import (
    hashed_linear_scores,
    train_hashed_linear,
)

SF = "/root/testdata/sf0.001"
DIM = 1 << 18


def _q10(x: float) -> decimal.Decimal:
    """Spark's double→DECIMAL(38,10): shortest repr, HALF_UP at 1e-10."""
    return decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal("1e-10"), rounding=decimal.ROUND_HALF_UP
    )


def _q12(x: float) -> decimal.Decimal:
    return decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal("1e-12"), rounding=decimal.ROUND_HALF_UP
    )


def _replay(tf_rows, labels, n_rounds, lr):
    """Sequential reference GD with the trainer's exact quantization:
    residuals quantized through DECIMAL(38,10) (dround), every cross-row
    sum an exact DECIMAL(38,12) accumulation."""
    n = len(labels)
    by_doc = collections.defaultdict(list)
    for doc, bucket, tf in tf_rows:
        by_doc[doc].append((bucket, tf))
    w: dict[int, float] = {}
    for _ in range(n_rounds):
        resid = {}
        for doc, y in labels.items():
            z_acc = decimal.Decimal(0)
            for bucket, tf in by_doc.get(doc, []):
                if bucket in w:
                    z_acc += _q12(tf * w[bucket])
            z = float(z_acc)
            resid[doc] = float(_q10(1.0 / (1.0 + math.exp(-z)) - y))
        grad = collections.defaultdict(decimal.Decimal)
        for doc, pairs in by_doc.items():
            r = resid[doc]
            for bucket, tf in pairs:
                grad[bucket] += _q12(tf * r)
        for bucket, g in grad.items():
            w[bucket] = w.get(bucket, 0.0) - lr * (float(g) / n)
    return w


def test_trainer_matches_sequential_replay(spark):
    from databricks_demo_feature_store_spark.textops.analysis import tokens_col
    from databricks_demo_feature_store_spark.textops.dedup import portable_hash_col

    docs = load(spark, SF, "documents").withColumn(
        "__label", (F.col("lang") == "en").cast("double")
    )
    got = {
        r["bucket"]: r["weight"]
        for r in train_hashed_linear(
            docs, "__label", dim=DIM, n_rounds=2, lr=1.0
        ).collect()
    }
    tf_rows = [
        (r["doc_id"], r["bucket"], r["tf"])
        for r in docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
        )
        .select(
            "doc_id", F.pmod(portable_hash_col(F.col("t")), F.lit(DIM)).alias("bucket")
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    ]
    labels = {r["doc_id"]: r["__label"] for r in docs.select("doc_id", "__label").collect()}
    want = _replay(tf_rows, labels, n_rounds=2, lr=1.0)
    assert set(got) == set(want)
    worst = max(abs(got[b] - want[b]) for b in got)
    # replay uses python math.exp (may differ from the JVM's by ulps
    # inside the dround quantum); everything else is exact decimals
    assert worst < 1e-9, worst


def test_training_separates_the_classes(spark):
    # constructed two-vocabulary corpus: separation is guaranteed to be
    # learnable, so this pins that the trainer actually learns (full-batch
    # GD on raw tf saturates with a large lr — 0.05 keeps margins sane)
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "good clean prose " + "quality " * (i % 3 + 1), 1.0))
        else:
            rows.append((i, "spam junk noise " + "garbage " * (i % 3 + 1), 0.0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, __label double")
    w = train_hashed_linear(docs, "__label", dim=DIM, n_rounds=8, lr=0.05)
    scored = hashed_linear_scores(docs, w, dim=DIM).join(
        docs.select("doc_id", "__label"), "doc_id"
    )
    means = {
        r["__label"]: r["m"]
        for r in scored.groupBy("__label").agg(F.avg("score").alias("m")).collect()
    }
    assert means[1.0] > 0.5 > means[0.0], means
    assert means[1.0] > means[0.0] + 0.2, means
