"""Feature-output standardization: PK renames, table prefixes, type rules.

Parity target: ``feature_output_standarize`` — every reference notebook
ends with a fixed select, PK rename to ``pk_customer``/``tpk_release_dt``,
a per-table prefix on non-key columns (``cdmg_``/``chr_``/``chp_``/
``cpym_``/``ctrx_`` — ``fs_cus_demographic.py:374-378``), then
decimal→float and long→int casts (:380-384).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

from databricks_demo_feature_store_spark.functions.types import standardize_feature_output


def prefix_columns(
    df: DataFrame, prefix: str, exclude: Sequence[str] = ()
) -> DataFrame:
    """Prefix every non-excluded column (reference
    ``fs_cus_demographic.py:374-378``)."""
    excluded = set(exclude)
    renames = {c: f"{prefix}{c}" for c in df.columns if c not in excluded}
    return df.withColumnsRenamed(renames)


def feature_output_standardize(
    df: DataFrame,
    key_renames: Mapping[str, str],
    prefix: str,
    select: Sequence[str] | None = None,
) -> DataFrame:
    """Fixed select → PK rename → prefix → type normalization.

    ``key_renames`` maps source key columns to their ``pk_``/``tpk_``
    names; everything else gets ``prefix``.
    """
    out = df.select(*select) if select else df
    out = out.withColumnsRenamed(dict(key_renames))
    out = prefix_columns(out, prefix, exclude=list(key_renames.values()))
    return standardize_feature_output(out)
