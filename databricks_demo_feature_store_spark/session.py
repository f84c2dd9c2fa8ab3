"""SparkSession factory tuned for the engine.

The reference runs on a Databricks single-node cluster
(``spark.master local[*, 4]``, see
``/root/reference/config/dev/job_resources/feature-store-bncapers-resource.yml:2-9``)
and delegates all physical planning to Catalyst. We do the same, but set the
knobs that matter at scale explicitly: AQE (runtime re-planning, skew-join
handling, partition coalescing), Arrow for any pandas interchange, UTC
session timezone (so results compare exactly against UTC-naive oracles),
and shuffle partitions sized to the local core count instead of the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "databricks_demo_feature_store_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[N]`` with N = SPARK_GRAFT_CPUS (32 in CI).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    # A long single-JVM session compiles thousands of generated query
    # classes; the JVM's default 240 MB code cache fills mid-run, after
    # which compilation is DISABLED and the whole session silently drops
    # to the bytecode interpreter (~10× — this, not plan shape, was a
    # full-suite bench regression). Reserve enough for the whole query
    # catalog and let the sweeper evict cold methods. (Measured: C2 with
    # this cache beats a C1-only cap by ~35% steady-state; C2's
    # background-compile CPU spikes only pollute a query's FIRST run,
    # which min-of-N benching already discards.)
    driver_java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if driver_java_opts is None and master.startswith("local"):
        driver_java_opts = "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): measured in round
        # 14, advisory-size coalescing (false) cost +13% on a mixed
        # 18-query sample (self-join-heavy plans — pair generation,
        # wedge counting — do real compute AFTER their shuffles and lose
        # core-width when a small shuffle collapses to one partition).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # saveAsTable targets (bucketed tables) land in /tmp, not the cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/databricks_demo_fs_warehouse"
            ),
        )
        # the driver testdata's events table carries TIMESTAMP(NANOS) which
        # Spark has no native type for; read as long and convert in load()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1's ChecksumCheckpointFileManager writes (and re-reads)
        # a sidecar checksum file for EVERY streaming-checkpoint file —
        # offsets, commits, and one state file per shuffle partition per
        # micro-batch — doubling checkpoint file creates. The checksums
        # only guard against storage bit-rot of checkpoint internals
        # (never query results); on storage with its own integrity
        # guarantees they are pure overhead, so default off and keep the
        # knob for deployments on unreliable stores.
        .config(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled",
            os.environ.get("SPARK_GRAFT_STREAM_CKPT_CHECKSUM", "false"),
        )
        # parquet's default INT96 timestamps carry NO footer min/max
        # statistics, which silently disables every timestamp-column
        # data-skipping path (sources/skipping.py) on Spark-written
        # tables — and INT96 is deprecated in the format anyway
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    if driver_java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", driver_java_opts)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
