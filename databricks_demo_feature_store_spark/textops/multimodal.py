"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition sizing) is
real and tested; the actual media decode is STUBBED — the decode libraries
(Pillow/librosa/av) are not in this container. ``decode_fn=None`` uses a
deterministic fake that "decodes" byte-length/checksum features so the
pipeline shape is exercised end-to-end; pass a real decoder in production.

Scale notes: binary payloads dominate partition size — ``media_repartition``
sizes partitions by *bytes*, not rows, so a 100 TB image corpus doesn't
produce 2 GB tasks; metadata-only transformations should project the
binary column away first (column pruning keeps it unread in parquet).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
        StructField("feature_dim", IntegerType(), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def _make_stub_decode() -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Deterministic fake decoder: byte stats instead of pixels/samples.

    Built as a nested closure (not a module-level function) so cloudpickle
    serializes it **by value**: Python workers on a cluster do not
    necessarily have this package importable, and a by-reference pickle
    would die with ModuleNotFoundError on the executor.
    """

    def stub(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        import pandas as _pd

        payloads = batch["payload"]
        return _pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                    "int64"
                ),
                "checksum": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
                "feature_dim": _pd.Series([64] * len(batch), dtype="int32"),
                "decode_ok": _pd.Series(["stub"] * len(batch)),
            }
        )

    return stub


def decode_features(
    media: DataFrame,
    decode_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    A real ``decode_fn`` would resize images / resample audio / sample
    frames and emit embedding columns; the stub keeps the identical
    dataflow. Caution for cluster use: pass a ``decode_fn`` that pickles by
    value (nested closure) or ship the defining module to the executors.
    """
    fn = decode_fn or _make_stub_decode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def real_decode_unavailable(*_args, **_kwargs):
    """Placeholder for the production decoder (Pillow / librosa / av)."""
    raise NotImplementedError(
        "Media decode libraries are not available in this environment; "
        "pass decode_fn=... with a real implementation."
    )


def media_repartition(media: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition a media table to ~target_bytes per partition using the
    payload sizes (binary rows are wildly non-uniform; row-count-based
    partitioning makes 2 GB tasks)."""
    stats = media.select(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("total")
    ).first()
    total = stats["total"] or 0
    nparts = max(1, int(total / target_bytes) + 1)
    return media.repartition(nparts)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a fake media table from the documents table (text → bytes) so
    the multimodal plumbing is exercisable on the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
