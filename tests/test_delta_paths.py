"""Delta-native execution paths (sources/writers.py HAS_DELTA branches).

This sandbox cannot install packages, and its PySpark (4.1.x) predates any
published compatible ``delta-spark`` release, so ``HAS_DELTA`` is False
here and these tests SKIP LOUDLY rather than silently passing dead code.
On an image with delta-spark installed (e.g. the reference's pinned
pyspark==3.5.0 + delta-spark 3.x), they run the real Delta MERGE /
OPTIMIZE / time-travel branches against the same assertions the parquet
emulation passes in test_featurestore.py / test_versioned.py.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta",
    reason="delta-spark not installed (sandbox: no package installs; "
    "HAS_DELTA branches covered by emulation-parity tests instead)",
)

from databricks_demo_feature_store_spark.sources.catalog import HAS_DELTA  # noqa: E402
from databricks_demo_feature_store_spark.sources.writers import (  # noqa: E402
    compact,
    merge_upsert,
    save_table,
)


@pytest.fixture()
def delta_spark():
    """A session with the Delta catalog extensions wired in."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-tests")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.shuffle.partitions", "4")
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark


def test_has_delta_flag_is_true_when_importable():
    assert HAS_DELTA, "delta imported but HAS_DELTA is False — gate is broken"


def test_delta_merge_upsert(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = delta_spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    save_table(df1, path, fmt="delta", mode="overwrite")
    df2 = delta_spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    merge_upsert(df2, path, keys=["k"], fmt="delta")
    out = {
        (r["k"], r["v"])
        for r in delta_spark.read.format("delta").load(path).collect()
    }
    assert out == {(1, "a"), (2, "B"), (3, "c")}


def test_delta_optimize_compacts(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    save_table(
        delta_spark.range(1000).repartition(16), path, fmt="delta", mode="overwrite"
    )
    compact(delta_spark, path, fmt="delta")
    assert delta_spark.read.format("delta").load(path).count() == 1000


def test_delta_time_travel(delta_spark, tmp_path):
    path = str(tmp_path / "t")
    save_table(delta_spark.range(10), path, fmt="delta", mode="overwrite")
    save_table(delta_spark.range(25), path, fmt="delta", mode="overwrite")
    v0 = delta_spark.read.format("delta").option("versionAsOf", 0).load(path)
    assert v0.count() == 10
    assert delta_spark.read.format("delta").load(path).count() == 25
