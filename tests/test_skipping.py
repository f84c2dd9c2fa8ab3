"""Tests for file-level min/max data skipping (sources/skipping.py) and
Bloom semi-join reduction (operators/joins.py bloom_filtered_join)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.operators import bloom_filtered_join
from databricks_demo_feature_store_spark.sources.skipping import (
    SkippingReport,
    harvest_file_stats,
    prune_files,
    read_with_skipping,
)


def _write_clustered(spark, path, n_files=6):
    df = spark.range(0, 600).select(
        F.col("id"),
        (F.col("id") * 10).cast("double").alias("val"),
        F.concat(F.lit("g"), (F.col("id") / 100).cast("int")).alias("grp"),
    )
    df.repartitionByRange(n_files, "id").write.mode("overwrite").parquet(path)
    return df


def test_harvest_and_prune_numeric(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    stats = harvest_file_stats(spark, path, ["id", "val"])
    got, report = read_with_skipping(
        spark, path, stats, [("id", ">=", 500.0)], residual="id >= 500"
    )
    assert report.pruned > 0, "range-clustered files must actually prune"
    assert report.files_kept >= 1
    # exactness: same rows as a full-scan filter
    full = spark.read.parquet(path).filter("id >= 500")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in full.collect())


def test_harvest_string_and_partition_values(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(0, 200).select(
        F.col("id"), F.concat(F.lit("k"), (F.col("id") % 4)).alias("part")
    )
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    stats = harvest_file_stats(spark, path)
    # partition-dir values become min=max stats rows
    pvals = {
        (r.min_str, r.max_str)
        for r in stats.filter(F.col("column") == "part").collect()
    }
    assert pvals == {(f"k{i}", f"k{i}") for i in range(4)}
    got, report = read_with_skipping(
        spark, path, stats, [("part", "=", "k2")], residual="part = 'k2'"
    )
    assert report.files_kept < report.files_total
    assert got.count() == 50
    assert {r.part for r in got.collect()} == {"k2"}


def test_prune_keeps_files_without_usable_stats(spark):
    stats = spark.createDataFrame(
        [
            ("f1", "x", 0.0, 10.0, None, None, 0, 5, True),
            ("f2", "x", None, None, None, None, 0, 5, False),  # no usable stats
            ("f3", "y", 0.0, 1.0, None, None, 0, 5, True),  # no row for x at all
        ],
        "file_path string, column string, min_num double, max_num double, "
        "min_str string, max_str string, null_count long, n_rows long, has_stats boolean",
    )
    kept = {r.file_path for r in prune_files(stats, [("x", ">", 100.0)]).collect()}
    # f1 disproved (max 10 < 100); f2/f3 must be KEPT — never prune blind
    assert kept == {"f2", "f3"}


def test_stale_stats_guard_raises(spark, tmp_path):
    path = str(tmp_path / "s")
    _write_clustered(spark, path, n_files=3)
    stats = harvest_file_stats(spark, path, ["id"]).cache()
    stats.count()
    # a file written AFTER the harvest must be detected
    spark.range(1000, 1010).select(
        F.col("id"), F.lit(0.0).alias("val"), F.lit("gX").alias("grp")
    ).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="re-harvest"):
        read_with_skipping(spark, path, stats, [("id", ">=", 0.0)], residual="id >= 0")


def test_empty_prune_preserves_schema(spark, tmp_path):
    path = str(tmp_path / "e")
    base = _write_clustered(spark, path, n_files=3)
    stats = harvest_file_stats(spark, path, ["id"])
    got, report = read_with_skipping(
        spark, path, stats, [("id", ">", 10_000.0)], residual="id > 10000"
    )
    assert report.files_kept == 0
    assert got.count() == 0
    assert set(got.columns) == set(base.columns)


def test_skipping_report_pruned():
    assert SkippingReport(files_total=8, files_kept=2).pruned == 6


def test_bloom_filtered_join_equals_plain_join(spark):
    left = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    right = (
        spark.range(0, 5000)
        .filter(F.col("id") % 50 == 0)
        .select(F.col("id").alias("rk"), F.lit("dim").alias("attr"))
    )
    got = bloom_filtered_join(left, right, "k", "rk", n_bits=1 << 14)
    plain = left.join(right, F.col("k") == F.col("rk"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_filtered_join_actually_reduces(spark):
    left = spark.range(0, 5000).select(F.col("id").alias("k"))
    right = spark.range(0, 10).select(F.col("id").alias("rk"))
    # probe the REDUCED side before the exact join: the bloom must kill
    # (nearly) all non-matching rows; allow a small false-positive band
    got = bloom_filtered_join(left, right, "k", "rk", how="left_semi", n_bits=1 << 14)
    n = got.count()
    assert 10 <= n <= 10 + 5000 * 0.01
    assert {r.k for r in got.collect()} >= set(range(10)) or n == 10


def test_bloom_filtered_join_string_keys_and_how_guard(spark):
    left = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    right = spark.createDataFrame([("b",), ("c",), ("d",)], "rk string")
    got = bloom_filtered_join(left, right, "k", "rk", n_bits=1 << 12)
    assert sorted(r.k for r in got.collect()) == ["b", "c"]
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_filtered_join(left, right, "k", "rk", how="left_outer")
