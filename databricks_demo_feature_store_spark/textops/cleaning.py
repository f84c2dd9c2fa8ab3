"""Corpus cleaning operators for training-data pipelines: PII redaction,
C4-style line filtering, and deterministic global shuffle sharding.

Net-new vs the reference (no corpus-cleaning surface there); these are the
standard steps between raw-crawl ingestion and tokenization in an LLM data
pipeline (C4: Raffel et al. 2020, "Exploring the Limits of Transfer
Learning"; PII scrubbing per the public BigScience/ROOTS and Dolma
pipelines).

Design for 100 TB:

- Redaction and line filtering are **pure per-row column algebra**
  (regexp_replace / split / filter / array_join) — whole-stage codegen,
  zero shuffle, linear scan.  No Python in the hot path.
- The regex dialect is the RE2-compatible subset (no backrefs, no
  lookaround) so the same patterns run identically on Spark (Java regex)
  and the DuckDB oracle (RE2).
- Shuffle sharding needs a total order *within each output shard* only —
  one hash-partitioned window per shard, never a global single-partition
  sort.  At 1000 executors each shard's window sorts ~1/n_shards of the
  corpus, and writing `partitionBy(shard)` streams each sorted shard
  straight to its training-data file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.textops.dedup import portable_hash_col

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, pattern, replacement) applied IN ORDER — email first (its local
# part may contain digit runs), then dotted-quad IPs (before the dashed
# number shapes), then SSN before phone (3-2-4 vs 3-3-4 are disjoint, but
# the order is pinned so engines can't disagree), then bare card numbers.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("card", r"\b\d{13,16}\b", "<CARD>"),
)


def redact_pii_col(text: Column) -> Column:
    """The redacted text: each PII pattern replaced by its tag, in order."""
    out = text
    for _name, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts_cols(text: Column) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL text (before redaction).

    Counts are computed pattern-by-pattern on the raw text; because the
    patterns match disjoint shapes this equals the sequential-redaction
    count, and it keeps each count independent of replacement order.
    """
    return {
        f"pii_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _rep in PII_PATTERNS
    }


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Redact PII in ``text_col`` (into ``out_col``, default in-place) and
    attach per-category ``pii_*`` counts plus ``pii_total``.

    Single projection — one codegen stage, no shuffle.
    """
    out_col = out_col or text_col
    text = F.col(text_col)
    counts = pii_counts_cols(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    cols = [c for c in df.columns if c != out_col]
    return df.select(
        *cols,
        redact_pii_col(text).alias(out_col),
        *[c.alias(n) for n, c in counts.items()],
        total.alias("pii_total"),
    )


# ---------------------------------------------------------------------------
# C4-style line-level cleaning
# ---------------------------------------------------------------------------

# Lowercased substrings that mark boilerplate lines (C4 §2.2 drops lines
# with "javascript", the lorem-ipsum placeholder, and code braces).
DEFAULT_LINE_BLACKLIST: tuple[str, ...] = ("javascript", "lorem ipsum", "{")

TERMINAL_PUNCT_RE = r'[.!?"]$'


def _line_keep_predicate(
    line: Column,
    min_words: int,
    require_terminal_punct: bool,
    blacklist: tuple[str, ...],
) -> Column:
    t = F.trim(line)
    keep = F.size(F.split(t, r"\s+")) >= min_words
    if require_terminal_punct:
        keep = keep & t.rlike(TERMINAL_PUNCT_RE)
    low = F.lower(t)
    for marker in blacklist:
        keep = keep & ~low.contains(marker)
    return keep


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
) -> DataFrame:
    """C4-style line filter: keep lines with ≥ ``min_words`` words that end
    in terminal punctuation and contain no blacklist marker; re-join with
    newlines.  Adds ``lines_total`` / ``lines_kept``.

    ``split``/``filter``/``array_join`` column algebra — per-row, no
    shuffle, no Python.
    """
    out_col = out_col or text_col
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda l: _line_keep_predicate(
            l, min_words, require_terminal_punct, blacklist
        ),
    )
    cols = [c for c in df.columns if c != out_col]
    return df.select(
        *cols,
        F.array_join(kept, "\n").alias(out_col),
        F.size(lines).alias("lines_total"),
        F.size(kept).alias("lines_kept"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle → training shards
# ---------------------------------------------------------------------------


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int | str = 0
) -> DataFrame:
    """Deterministic global shuffle for training order: assign each row a
    ``shard`` in [0, n_shards) and a dense ``pos`` within its shard, both
    pure functions of (key, seed).

    The portable 60-bit hash gives the random-but-reproducible order;
    sharding FIRST means each ``row_number`` window sorts only ~1/n_shards
    of the data on its own hash partition — there is never a global
    single-partition sort, which is what makes this survive 100 TB (the
    naive ``ORDER BY hash`` + global row_number funnels everything through
    one task).  Downstream writes ``partitionBy("shard")`` +
    ``sortWithinPartitions("pos")`` to stream shards out in order.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    k = portable_hash_col(F.col(key_col).cast("string"), seed)
    win = Window.partitionBy("shard").orderBy("_shuffle_key", key_col)
    return (
        df.withColumn("_shuffle_key", k)
        .withColumn("shard", F.pmod(F.col("_shuffle_key"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(win) - F.lit(1))
        .drop("_shuffle_key")
    )
