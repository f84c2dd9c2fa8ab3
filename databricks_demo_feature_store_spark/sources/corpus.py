"""Corpus ingestion sources: JSONL / CSV / parquet / raw text → one
normalized document schema.

A training-data pipeline rarely starts from tidy parquet — crawls arrive
as JSONL (one doc per line, usually gzipped), CSV exports, or raw text
files. ``read_corpus`` normalizes any of them to the engine's document
contract ``(doc_id, text, …passthrough metadata)`` so every downstream
operator (dedup, quality, chunking, DSIR, …) runs unchanged.

Scale notes:

- JSONL and CSV are line-splittable; gzip members are NOT — a ``.gz``
  file is one split no matter its size, so shard compressed corpora into
  many files (the standard crawl layout) and parallelism comes from the
  file count. Spark decompresses transparently either way.
- ``id_from="hash"`` derives the doc id from the text's md5 (first 15 hex
  digits as a 60-bit long) — deterministic across reruns/engines, no
  ``monotonically_increasing_id`` (which is partition-layout-dependent
  and breaks differential checks).
- Schema is explicit, never inferred twice: pass ``text_field`` (and
  optionally ``id_field``) and everything else rides along untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_FORMATS = ("jsonl", "csv", "parquet", "text")


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    text_field: str = "text",
    id_field: str | None = None,
    csv_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a document corpus into ``(doc_id long, text string, …)``.

    ``fmt``: ``jsonl`` (one JSON object per line, ``.gz`` transparent),
    ``csv`` (header by default; override via ``csv_options``),
    ``parquet``, or ``text`` (one doc per line, no metadata).
    ``id_field=None`` → deterministic 60-bit md5 hash of the text SALTED
    with the source file's BASENAME — raw crawls repeat identical texts
    across files constantly, and an unsalted content hash would silently
    collapse those rows onto one doc_id (downstream groupBys would then
    double-count occurrences under a single id). The salt is the file
    name only, never the absolute URI: re-reading the identical corpus
    from a different directory, mount point, or host yields the SAME
    doc_ids, so persisted downstream artifacts (dedup clusters, feature
    tables, span reports) keyed on them survive relocation. Two
    caveats, both inherent to name-salting: identical texts in the SAME
    file share an id (they are indistinguishable rows — run exact dedup
    explicitly if that matters), and identical texts in two files that
    share a basename across subdirectories also collide (crawl shards
    are conventionally uniquely numbered; rename shards if yours
    aren't).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"read_corpus fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt == "jsonl":
        df = spark.read.json(path)
    elif fmt == "csv":
        opts = {"header": "true", **(csv_options or {})}
        df = spark.read.options(**opts).csv(path)
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        df = spark.read.text(path).withColumnRenamed("value", text_field)

    if text_field not in df.columns:
        raise ValueError(
            f"corpus at {path!r} has no {text_field!r} column (columns: {df.columns})"
        )
    text = F.col(text_field).cast("string")
    if id_field is not None:
        if id_field not in df.columns:
            raise ValueError(f"id column {id_field!r} not in {df.columns}")
        doc_id = F.col(id_field).cast("long")
    else:
        basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
        doc_id = F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", basename, text)), 1, 15
            ),
            16,
            10,
        ).cast("long")
    passthrough = [
        c for c in df.columns if c not in (text_field, id_field, "doc_id")
    ]
    return df.select(
        doc_id.alias("doc_id"), text.alias("text"), *[F.col(c) for c in passthrough]
    )
