"""Layered lakehouse catalog: ``source → ingestion → preprocessing → feature``.

Parity target: ``get_table`` / layer resolution in the reference's
``src/packages/storage/storage_operations.py:19-57`` — a dataset name +
layer resolves to either a metastore table or a path in a layer directory.
Our catalog is a plain dict of layer roots; formats are parquet by default
with Delta used automatically when ``delta-spark`` is importable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

try:  # Delta is optional — not present in the v1 image.
    from delta.tables import DeltaTable  # noqa: F401

    HAS_DELTA = True
except Exception:  # pragma: no cover
    HAS_DELTA = False

LAYERS = ("source", "ingestion", "preprocessing", "feature")
DEFAULT_FORMAT = "delta" if HAS_DELTA else "parquet"


@dataclass(frozen=True)
class DatasetRef:
    name: str
    layer: str
    fmt: str = DEFAULT_FORMAT


@dataclass
class Catalog:
    """Resolves (dataset, layer) → storage path and reads/writes through it."""

    root: str
    layer_roots: dict[str, str] = field(default_factory=dict)

    def path(self, name: str, layer: str = "source") -> str:
        if layer not in LAYERS:
            raise ValueError(f"Unknown layer {layer!r}; expected one of {LAYERS}")
        base = self.layer_roots.get(layer, os.path.join(self.root, layer))
        return os.path.join(base, name)

    def get_table(
        self,
        spark: SparkSession,
        name: str,
        layer: str = "source",
        fmt: str | None = None,
    ) -> DataFrame:
        """Layered read (reference ``storage_operations.py:19-57``).

        Catalog tables are tried first (``spark.read.table``), then the
        layer path with the given format.
        """
        if spark.catalog.tableExists(name):
            return spark.read.table(name)
        fmt = fmt or DEFAULT_FORMAT
        return spark.read.format(fmt).load(self.path(name, layer))

    def exists(self, spark: SparkSession, name: str, layer: str = "source") -> bool:
        """Existence probe (reference uses ``dbutils.fs.ls`` /
        ``DeltaTable.isDeltaTable`` — ``storage_operations.py:59-73``)."""
        if spark.catalog.tableExists(name):
            return True
        path = self.path(name, layer)
        # local filesystem check; on cloud storage this becomes a FileSystem call
        return os.path.exists(path)
