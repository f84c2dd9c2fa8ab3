"""Sinks: layer writer with overwrite/append/merge + partition-overwrite.

Parity target: ``save_table`` — reference
``src/packages/storage/storage_operations.py:75-211``: delta/parquet
formats; modes overwrite/append/merge; ``partitionBy(historical_key)``;
``replaceWhere``-style partition overwrite derived from the incoming data's
distinct partition values (:161-176); Delta MERGE upsert (:178-188);
parquet dynamic partition overwrite (:194-199).

Without Delta on the classpath, MERGE is emulated exactly with
**anti-join + unionByName + dynamic partition overwrite**: existing rows
whose keys collide are replaced by the incoming rows, everything else is
kept. At scale the rewrite cost is bounded by partitioning on the
historical key so only affected partitions rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_demo_feature_store_spark.sources.catalog import HAS_DELTA

if HAS_DELTA:  # pragma: no cover - delta not in the test image
    from delta.tables import DeltaTable


def _write(df: DataFrame, path: str, fmt: str, mode: str, partition_by: Sequence[str] | None) -> None:
    writer_df = df
    if partition_by:
        # co-locate each hive-partition value's rows BEFORE the split:
        # without this every task writes a sliver into every partition
        # directory — tasks × partitions small files (the classic
        # partitioned-write mistake; measured as the dominant cost of the
        # partitioned index build in the round-12 100× run). One shuffle
        # on the layout columns → one well-sized file per directory.
        writer_df = df.repartition(*[F.col(c) for c in partition_by])
    writer = writer_df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


class CheckConstraintViolation(ValueError):
    """Raised by :func:`enforce_check_constraints`; carries per-constraint
    violation counts in ``.counts``."""

    def __init__(self, counts: dict):
        self.counts = counts
        super().__init__(
            "check constraint(s) violated: "
            + ", ".join(f"{k!r} ({v} rows)" for k, v in counts.items())
        )


def enforce_check_constraints(df: DataFrame, constraints: Sequence[str]) -> None:
    """Validate every constraint in ONE aggregation job (conditional
    counts — map-side combinable); raise :class:`CheckConstraintViolation`
    with the per-constraint violation counts if any row fails. NULL
    results PASS (SQL CHECK semantics), so ``x > 0`` does not reject
    NULL x — add ``x IS NOT NULL`` explicitly for that."""
    from pyspark.sql import functions as F

    constraints = list(constraints)
    aggs = [
        F.sum(
            F.when(~F.coalesce(F.expr(c), F.lit(True)), 1).otherwise(0)
        ).alias(f"__c{i}")
        for i, c in enumerate(constraints)
    ]
    row = df.agg(*aggs).first()
    counts = {
        c: int(row[f"__c{i}"] or 0)
        for i, c in enumerate(constraints)
        if (row[f"__c{i}"] or 0) > 0
    }
    if counts:
        raise CheckConstraintViolation(counts)


class ConcurrentWriteError(RuntimeError):
    """A staged-swap rewrite detected another writer's commit between its
    read and its swap — the rewrite was computed from a stale snapshot,
    and promoting it would silently erase the other writer's commit (the
    lost update). The loser's staging directory is discarded; retry the
    whole operation against the new table state."""


def table_generation(path: str) -> tuple[int, int] | None:
    """Generation token for optimistic concurrency over a staged-swap
    table: ``(top-dir inode, max mtime_ns across the tree)``. Every
    ``_swap_dirs`` promotion replaces the top directory (new inode) and
    every append lands a newer-mtime file somewhere in the tree, so any
    commit by another writer changes the token. Driver-side metadata,
    O(files) — the same cost class as ``maybe_compact``'s listing.
    ``None`` when the table does not exist yet."""
    import os

    p = path.removeprefix("file:").rstrip("/")
    try:
        top = os.stat(p)
    except FileNotFoundError:
        return None
    newest = top.st_mtime_ns
    for root, _dirs, names in os.walk(p):
        newest = max(newest, os.stat(root).st_mtime_ns)
        for n in names:
            try:
                newest = max(newest, os.stat(os.path.join(root, n)).st_mtime_ns)
            except FileNotFoundError:
                # a concurrent writer removing files mid-walk is itself a
                # generation change; the mtime of its rename target wins
                continue
    return (top.st_ino, newest)


def retry_on_conflict(fn, attempts: int = 3):
    """Run a staged-swap write, retrying on :class:`ConcurrentWriteError`
    — the optimistic-concurrency loop every caller wants: each retry
    re-reads the table (the writers capture a fresh generation token per
    call), so the winning state is always built on the latest commit.
    Linear backoff is deliberately absent: the conflict window is the
    rewrite's own runtime, so an immediate retry cannot livelock two
    writers the way lock-free counters can — one of them always
    committed. Raises the last conflict after ``attempts`` tries."""
    last: ConcurrentWriteError | None = None
    for _ in range(max(1, attempts)):
        try:
            return fn()
        except ConcurrentWriteError as exc:
            last = exc
    raise last


_UNCHECKED = object()


def _swap_dirs(live: str, staging: str, expected_generation=_UNCHECKED) -> None:
    """Promote ``staging`` to ``live`` via directory renames, never a
    delete-then-rewrite of the live table.

    A crash between the two renames leaves EITHER the old table (rename #1
    done, #2 pending — recoverable from ``__old``) or the new table, never a
    partially-deleted live directory. On POSIX/HDFS a directory rename is a
    single metadata op; on object stores the real fix is the Delta path
    (atomic log commit), which this fallback stands in for.

    ``expected_generation`` (from :func:`table_generation`, captured when
    the rewrite STARTED reading) arms the optimistic-concurrency check:
    if the live table's generation changed between read and swap, another
    writer committed in the window — the swap raises
    :class:`ConcurrentWriteError` and discards ``staging`` instead of
    silently clobbering that commit. Single-writer callers (bootstrap
    writes, sidecar refreshes) omit it. The residual check→rename race is
    microseconds wide and loses only to a writer that slipped a full
    commit inside it; the zero-window fix is an atomic log commit (Delta),
    which this emulation stands in for.
    """
    import os
    import shutil

    live = live.removeprefix("file:")
    staging = staging.removeprefix("file:")
    if expected_generation is not _UNCHECKED:
        current = table_generation(live)
        if current != expected_generation:
            shutil.rmtree(staging, ignore_errors=True)
            raise ConcurrentWriteError(
                f"table {live!r} changed while this rewrite was running "
                f"(generation {expected_generation} -> {current}); "
                "its snapshot is stale — retry against the new state"
            )
    old = live.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(staging, live)
    shutil.rmtree(old, ignore_errors=True)


def _read_folding_dv(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Scan ``path`` with pending deletion-vector deletes FOLDED OUT.

    Every staged full rewrite (``compact``, ``merge_upsert``) promotes a
    fresh directory over the live one, discarding the ``_dv`` sidecar with
    it — so a plain scan here would silently RESURRECT rows the user
    deleted (for GDPR erasure that is silent un-deletion, the exact
    failure ``read_with_skipping`` guards against for stale stats). Any
    rewrite must therefore read through the DV fold; the subsequent swap
    then bakes the deletes in, mirroring ``apply_deletes``.
    """
    if fmt == "parquet":
        import os

        from databricks_demo_feature_store_spark.sources.deletion_vectors import (
            dv_path,
            read_with_deletes,
        )

        if os.path.isdir(dv_path(path.removeprefix("file:"))):
            return read_with_deletes(spark, path)
    return spark.read.format(fmt).load(path)


def save_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    merge_keys: Sequence[str] | None = None,
    partition_overwrite: bool = False,
    stats_columns: Sequence[str] | None = None,
    bloom_columns: Sequence[str] | None = None,
    check_constraints: Sequence[str] | None = None,
    auto_compact: "CompactionPolicy | None" = None,
    generated_columns: dict[str, str] | None = None,
) -> None:
    """Write a layer table.

    - ``mode="overwrite"`` with ``partition_overwrite=True`` replaces only
      the partitions present in ``df`` (the reference's ``replaceWhere`` /
      dynamic ``partitionOverwriteMode``, ``storage_operations.py:161-199``).
    - ``mode="merge"`` upserts on ``merge_keys`` (Delta MERGE when
      available, anti-join emulation otherwise).
    - ``check_constraints`` — SQL boolean expressions enforced BEFORE any
      byte lands (the Delta ``ALTER TABLE ADD CONSTRAINT CHECK`` twin):
      a row violates a constraint iff the expression is FALSE (NULL
      passes, SQL CHECK semantics). All constraints validate in ONE
      aggregation pass; any violation raises with per-constraint counts
      and the write never starts — a constrained table can't be
      half-poisoned.
    - ``auto_compact`` — a :class:`CompactionPolicy` makes append-mode
      writes self-maintaining: after the append (and its incremental
      sidecar refresh), the policy inspects the file listing and
      triggers :func:`maybe_compact` when the small-file threshold
      trips — the Delta auto-compaction twin. No-op below threshold.
    - ``generated_columns`` — ``{name: sql_expr}`` computed columns (the
      Delta ``GENERATED ALWAYS AS`` twin): a missing column is computed
      from its expression at write time; a PRESENT column is instead
      VALIDATED against the expression through the same one-pass CHECK
      machinery (null-safe equality, so a hand-supplied wrong value —
      including a wrong NULL — rejects the write). The canonical use is
      a derived partition column (``{"o_year": "year(o_orderdate)"}``,
      ``partition_by=["o_year"]``), which buys partition pruning without
      trusting callers to derive the column consistently.
    """
    spark = df.sparkSession
    if generated_columns:
        extra_checks: list[str] = []
        for name, expr in generated_columns.items():
            if name in df.columns:
                # caller supplied the column: every row must MATCH the
                # generation expression (Delta rejects mismatches too)
                extra_checks.append(f"{name} <=> ({expr})")
            else:
                df = df.withColumn(name, F.expr(expr))
        if extra_checks:
            check_constraints = list(check_constraints or []) + extra_checks
    if check_constraints:
        # pin the plan FIRST: validating one evaluation and writing a
        # re-evaluation would un-guarantee 'no half-poisoned table' for
        # non-deterministic plans (and pays a second full computation)
        df = df.localCheckpoint(eager=True)
        enforce_check_constraints(df, check_constraints)
    if mode == "merge":
        if not merge_keys:
            raise ValueError("merge mode requires merge_keys")
        merge_upsert(df, path, list(merge_keys), fmt=fmt, partition_by=partition_by)
        _refresh_stats(spark, path, fmt, stats_columns, bloom_columns)
        return
    if mode == "overwrite" and partition_overwrite and partition_by:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            _write(df, path, fmt, "overwrite", partition_by)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        _refresh_stats(spark, path, fmt, stats_columns, bloom_columns)
        return
    _write(df, path, fmt, mode, partition_by)
    compacting = (
        mode == "append"
        and auto_compact is not None
        and _policy_trips(path, auto_compact)
    )
    if not compacting:
        # append adds immutable files — refresh the sidecars incrementally
        # (only new files' footers/pages are read). When the compaction
        # policy is about to trip, this pass is skipped outright: the
        # rewrite replaces every file and re-harvests full sidecars
        # itself, so an incremental refresh here (including the bloom
        # data-page read of the new files) would be pure waste.
        _refresh_stats(
            spark, path, fmt, stats_columns, bloom_columns,
            incremental=(mode == "append"),
        )
    if auto_compact is not None and mode == "append":
        maybe_compact(
            spark, path, fmt, policy=auto_compact,
            stats_columns=stats_columns, bloom_columns=bloom_columns,
        )


def _refresh_stats(
    spark: SparkSession,
    path: str,
    fmt: str,
    stats_columns: Sequence[str] | None,
    bloom_columns: Sequence[str] | None = None,
    incremental: bool = False,
) -> None:
    """Write-time stats collection (the Delta ``add.stats`` twin): when a
    caller opts in via ``stats_columns``, every table mutation refreshes
    the ``_stats`` sidecar so `read_with_skipping`'s coverage guard stays
    satisfied. Footer-only — O(files), no data pages. ``bloom_columns``
    additionally refreshes the per-file Bloom sidecar (the Delta
    bloom-filter-index twin; this one DOES read data pages)."""
    if fmt != "parquet":
        return
    if stats_columns is not None:
        from databricks_demo_feature_store_spark.sources.skipping import (
            write_stats_sidecar,
        )

        write_stats_sidecar(
            spark, path.removeprefix("file:"), list(stats_columns),
            incremental=incremental,
        )
    if bloom_columns is not None:
        from databricks_demo_feature_store_spark.sources.skipping import (
            write_bloom_sidecar,
        )

        write_bloom_sidecar(
            spark, path.removeprefix("file:"), list(bloom_columns),
            incremental=incremental,
        )


def merge_upsert(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    update_columns: Sequence[str] | None = None,
) -> None:
    """Upsert ``df`` into the table at ``path`` keyed on ``keys``.

    Delta path: ``DeltaTable.merge`` with ``whenMatchedUpdate`` (restricted
    to ``update_columns`` when given, matching the reference's
    new-columns-only merge at ``notebooks/utils.py:1748-1758``) +
    ``whenNotMatchedInsertAll``.

    Parquet fallback: keep = existing ⟕anti df; out = keep ∪ df. When
    ``update_columns`` is given, matched rows keep their old values except
    the listed columns (reference semantics for schema-evolution merges).
    """
    spark = df.sparkSession
    keys = list(keys)

    if HAS_DELTA:  # pragma: no cover
        from delta.tables import DeltaTable

        if DeltaTable.isDeltaTable(spark, path):
            target = DeltaTable.forPath(spark, path)
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
            merge = target.alias("t").merge(df.alias("s"), cond)
            if update_columns:
                merge = merge.whenMatchedUpdate(
                    set={c: f"s.{c}" for c in update_columns}
                )
            else:
                merge = merge.whenMatchedUpdateAll()
            merge.whenNotMatchedInsertAll().execute()
            return
        _write(df, path, "delta", "overwrite", partition_by)
        return

    from pyspark.errors import AnalysisException

    # optimistic concurrency: token BEFORE the read plan is built — any
    # other writer's commit between here and the swap aborts the promotion
    generation = table_generation(path)
    try:
        # DV-aware: a staged rewrite discards the _dv sidecar, so pending
        # row-level deletes MUST fold into `existing` here or they resurrect
        existing = _read_folding_dv(spark, path, fmt)
        table_exists = True
    except AnalysisException:
        # only the analysis-time path miss means "no table yet" — any
        # other failure must propagate, not bootstrap-overwrite the data
        table_exists = False

    if not table_exists:
        _write(df, path, fmt, "overwrite", partition_by)
        return

    incoming = df
    if update_columns:
        # Matched rows: existing values except update_columns, which come
        # from the incoming side; unmatched incoming rows insert whole.
        upd = list(update_columns)
        matched = (
            existing.alias("t")
            .join(incoming.alias("s"), on=keys, how="inner")
            .select(
                *[F.col(f"t.{c}").alias(c) for c in existing.columns if c not in keys and c not in upd],
                *[F.col(f"s.{c}").alias(c) for c in upd],
                *[F.col(f"t.{k}").alias(k) for k in keys],
            )
        )
        unmatched_new = incoming.join(existing.select(*keys), on=keys, how="left_anti")
        kept = existing.join(incoming.select(*keys), on=keys, how="left_anti")
        out = kept.unionByName(matched, allowMissingColumns=True).unionByName(
            unmatched_new, allowMissingColumns=True
        )
    else:
        kept = existing.join(incoming.select(*keys), on=keys, how="left_anti")
        out = kept.unionByName(incoming, allowMissingColumns=True)

    # Self-overwrite safety: materialize to a temp location first, then
    # promote via rename (never delete-then-rewrite the live table).
    staging = path.rstrip("/") + "__staging"
    _write(out, staging, fmt, "overwrite", partition_by)
    _swap_dirs(path, staging, expected_generation=generation)


def compact(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_partitions: int | None = None,
    stats_columns: Sequence[str] | None = None,
    bloom_columns: Sequence[str] | None = None,
) -> None:
    """Post-write compaction (the reference runs Delta ``OPTIMIZE`` after
    every save — ``notebooks/utils.py:1762-1765``). For parquet we rewrite
    with coalesce to the target file count.

    The directory swap drops any ``_stats`` sidecar with the old files
    (stale stats can never survive a compaction); pass ``stats_columns``
    to re-harvest for the new layout in the same call.
    """
    if HAS_DELTA:  # pragma: no cover
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return
    generation = table_generation(path)
    # DV-aware for the same reason as merge_upsert: the swap below drops
    # any _dv sidecar, so the rewrite must bake pending deletes in
    df = _read_folding_dv(spark, path, fmt)
    n = target_partitions or max(1, df.rdd.getNumPartitions() // 4)
    staging = path.rstrip("/") + "__compact"
    df.coalesce(n).write.format(fmt).mode("overwrite").save(staging)
    _swap_dirs(path, staging, expected_generation=generation)
    _refresh_stats(spark, path, fmt, stats_columns, bloom_columns)


from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class CompactionPolicy:
    """Auto-compaction thresholds (the Delta auto-compaction /
    ``optimizeWrite`` policy twin, driven like the round-12
    drift-triggered index rebuild: measure → threshold → act).

    A table qualifies when at least ``min_small_files`` data files are
    smaller than ``small_file_bytes`` — the steady-state failure mode of
    append-heavy ingestion (every micro-batch lands a sliver; at 100 TB
    the file count, not the byte count, kills scan planning). The
    rewrite targets ``target_file_bytes`` per output file, and
    ``zorder_by`` additionally re-clusters along the Z-curve so the
    compaction that has to rewrite everything anyway also restores
    multi-column min/max pruning.
    """

    small_file_bytes: int = 32 << 20
    min_small_files: int = 8
    target_file_bytes: int = 128 << 20
    zorder_by: tuple[str, ...] | None = None
    zorder_bits: int = 16


def _policy_trips(path: str, policy: CompactionPolicy) -> bool:
    """Driver-side compaction pre-flight: does the live file listing
    satisfy the policy's small-file trigger? O(files) metadata, no Spark
    job — cheap enough that ``save_table`` runs it once per append to
    decide whether the incremental sidecar refresh would be wasted."""
    import os

    from databricks_demo_feature_store_spark.sources.skipping import (
        _list_part_files,
    )

    files = _list_part_files(path.removeprefix("file:"))
    if not files:
        return False
    small = sum(
        1 for f in files if os.path.getsize(f) < policy.small_file_bytes
    )
    return small >= policy.min_small_files


def maybe_compact(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    policy: CompactionPolicy = CompactionPolicy(),
    stats_columns: Sequence[str] | None = None,
    bloom_columns: Sequence[str] | None = None,
) -> bool:
    """Policy-gated compaction: inspect the live file listing (driver-side
    metadata, O(files), no Spark job) and rewrite only when the policy
    trips. Returns whether a compaction ran.

    The decision is size-based, not sidecar-based, so it works on tables
    that never opted into stats. The rewrite itself goes through the same
    staged-swap + DV-fold discipline as :func:`compact`; with
    ``zorder_by`` it is a :func:`cluster_by_zorder` rewrite (one range
    exchange + local sort) instead of a plain coalesce."""
    import math
    import os

    from databricks_demo_feature_store_spark.sources.skipping import (
        _list_part_files,
    )

    files = _list_part_files(path.removeprefix("file:"))
    if not files:
        return False
    sizes = [os.path.getsize(f) for f in files]
    small = sum(1 for s in sizes if s < policy.small_file_bytes)
    if small < policy.min_small_files:
        return False
    n = max(1, math.ceil(sum(sizes) / policy.target_file_bytes))
    if policy.zorder_by:
        from databricks_demo_feature_store_spark.operators.layout import (
            cluster_by_zorder,
        )

        generation = table_generation(path)
        df = _read_folding_dv(spark, path, fmt)
        clustered = cluster_by_zorder(
            df, list(policy.zorder_by), bits=policy.zorder_bits, num_partitions=n
        )
        staging = path.rstrip("/") + "__compact"
        clustered.write.format(fmt).mode("overwrite").save(staging)
        _swap_dirs(path, staging, expected_generation=generation)
        _refresh_stats(spark, path, fmt, stats_columns, bloom_columns)
    else:
        compact(
            spark, path, fmt, target_partitions=n,
            stats_columns=stats_columns, bloom_columns=bloom_columns,
        )
    return True
