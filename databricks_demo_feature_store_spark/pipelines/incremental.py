"""Incremental feature materialization: recompute only changed entities.

At 100 TB the daily reality of a feature store is that a small fraction of
entities receive new source rows; rerunning a whole pipeline to refresh
them burns the cluster. The correct incremental granularity for this
engine's pipelines is the ENTITY, not the month: lag/rolling features use
row frames over each entity's observed months (and lag/diff/RSI chains
propagate forward indefinitely), so one changed source row can move every
later feature row of that entity — but never any other entity's rows.
Every pipeline here is per-entity decomposable (features never mix
entities: aggregations, windows and ratios all partition by the entity
key), which makes "recompute the changed entities, replace their rows"
exactly equal to a full rerun. That equality is not assumed — the driver
gate checks the incremental result against the full-recompute oracle
(``q_pipeline_incremental``).

Scale shape: the changed-entity set is broadcast into a left-semi join
that prunes the source scan (predicate reaches the parquet scan; with the
source bucketed by entity the semi-join is shuffle-free), the pipeline
runs on that slice only, and the write replaces exactly the affected
entities' rows (Delta: ``MERGE`` with a source-scoped delete; parquet
fallback: anti-join + staged swap).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.sources.writers import _swap_dirs, _write


def replace_entities(
    df: DataFrame,
    path: str,
    entity_col: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Replace ALL rows of the entities present in ``df`` with ``df``'s
    rows (delete-then-insert scoped to those entities) — unlike a keyed
    upsert, rows the entity no longer produces (a retracted month) are
    removed.

    Delta form: ``MERGE ON t.entity = s.entity`` with
    ``whenMatchedDelete`` + append, or ``replaceWhere entity IN (...)``.
    Parquet fallback: kept = existing ⟕anti(entity) df, out = kept ∪ df,
    staged write + directory swap (never delete-then-rewrite the live
    table).
    """
    from pyspark.errors import AnalysisException

    from databricks_demo_feature_store_spark.sources.writers import (
        table_generation,
    )

    spark = df.sparkSession
    generation = table_generation(path)
    try:
        existing = spark.read.format(fmt).load(path)
    except AnalysisException:
        # first write only: the table path does not exist yet. ONLY the
        # analysis-time miss may fall through to the bootstrap overwrite —
        # a transient read error overwriting the live table with one
        # batch would be silent data loss
        _write(df, path, fmt, "overwrite", partition_by)
        return
    touched = df.select(entity_col).distinct()
    kept = existing.join(F.broadcast(touched), on=entity_col, how="left_anti")
    out = kept.unionByName(df, allowMissingColumns=True)
    staging = path.rstrip("/") + "__staging"
    _write(out, staging, fmt, "overwrite", partition_by)
    _swap_dirs(path, staging, expected_generation=generation)


def incremental_entity_refresh(
    source: DataFrame,
    changed_entities: DataFrame,
    compute: Callable[[DataFrame], DataFrame],
    entity_in: str,
    entity_out: str,
    table_path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Refresh the feature table at ``table_path`` for ``changed_entities``
    only.

    ``compute`` is the full pipeline (source slice → standardized feature
    frame); ``entity_in`` / ``entity_out`` name the entity key on the
    source / output side (pipelines rename, e.g. ``o_custkey`` →
    ``pk_customer``). The source is pruned with a broadcast left-semi
    join BEFORE the pipeline runs, so the scan, shuffle and window work
    all scale with the changed slice, not the table.

    Contract: ``compute`` must be per-entity decomposable (true for every
    pipeline in this package — see module docstring; the driver gate
    proves it against a full-recompute oracle).
    """
    keys = changed_entities.select(
        F.col(changed_entities.columns[0]).alias(entity_in)
    ).distinct()
    src = source.join(F.broadcast(keys), on=entity_in, how="left_semi")
    out = compute(src)
    replace_entities(out, table_path, entity_out, fmt, partition_by)
