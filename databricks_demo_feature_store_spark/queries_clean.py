"""Corpus-cleaning queries: PII redaction, C4-style line filtering, and
deterministic shuffle sharding, each with a full-value DuckDB oracle.

The synthetic documents corpus contains no PII and no newlines, so each
query first SYNTHESIZES the structure it cleans — with the identical
deterministic expression on both engines (concat of substrings + doc_id
arithmetic) — and then exercises the operator end-to-end. The oracle
therefore checks the cleaning algebra itself (regex semantics, line
predicates, hash sharding), not a no-op pass-through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from databricks_demo_feature_store_spark.queries import load, register
from databricks_demo_feature_store_spark.textops.cleaning import (
    PII_PATTERNS,
    clean_lines,
    scrub_pii,
    shuffle_shards,
)

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# DuckDB twins of PII_PATTERNS, applied in the same order with the 'g' flag
# (Spark's regexp_replace is global by default; DuckDB's needs the flag).


def _o_redact(expr: str) -> str:
    out = expr
    for _name, pat, rep in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


def _o_counts() -> str:
    return ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS pii_{name}"
        for name, pat, _rep in PII_PATTERNS
    )


def _pii_synth_spark() -> list:
    # built lazily: Columns can't be constructed before a session exists
    return [
        F.substring(F.col("text"), 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" ssn 123-45-6789 call 555-123-4567 card 4111111111111111 end"),
    ]

_PII_SYNTH_SQL = (
    "concat(substr(text, 1, 40), ' contact user', doc_id, "
    "'@mail.example.com ip 10.', doc_id % 256, '.0.', doc_id % 100, "
    "' ssn 123-45-6789 call 555-123-4567 card 4111111111111111 end')"
)


@register(
    "q_ext_pii_scrub",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id, {_PII_SYNTH_SQL} AS text FROM documents
    )
    SELECT doc_id,
           {_o_redact('text')} AS text,
           {_o_counts()},
           len(regexp_extract_all(text, '{PII_PATTERNS[0][1]}'))
         + len(regexp_extract_all(text, '{PII_PATTERNS[1][1]}'))
         + len(regexp_extract_all(text, '{PII_PATTERNS[2][1]}'))
         + len(regexp_extract_all(text, '{PII_PATTERNS[3][1]}'))
         + len(regexp_extract_all(text, '{PII_PATTERNS[4][1]}')) AS pii_total
    FROM synth
    """,
)
def q_ext_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the documents corpus (email / IP / SSN / phone /
    card patterns, RE2-portable), with per-category match counts.

    Pure per-row regexp algebra — one codegen stage, zero shuffles at any
    scale. PII is synthesized deterministically from doc_id so the oracle
    checks real redactions, not a no-op.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.concat(*_pii_synth_spark()).alias("text")
    )
    return scrub_pii(docs, "text")


# ---------------------------------------------------------------------------
# C4-style line cleaning
# ---------------------------------------------------------------------------

_LINE_PRED_SQL = (
    "len(regexp_split_to_array(trim(l), '\\s+')) >= 3"
    " AND regexp_matches(trim(l), '[.!?\"]$')"
    " AND NOT contains(lower(trim(l)), 'javascript')"
    " AND NOT contains(lower(trim(l)), 'lorem ipsum')"
    " AND NOT contains(lower(trim(l)), '{')"
)


@register(
    "q_ext_line_clean",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             concat_ws(chr(10),
               concat(substr(text, 1, 60), '.'),
               'Enable JavaScript to continue browsing.',
               'too short',
               concat('config = {{ ', substr(text, 61, 20), ' }}'),
               concat(substr(text, 81, 40), ' all done.')) AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS ls,
             list_filter(string_split(text, chr(10)), l -> {_LINE_PRED_SQL}) AS kept
      FROM synth
    )
    SELECT doc_id,
           array_to_string(kept, chr(10)) AS text,
           CAST(len(ls) AS INT) AS lines_total,
           CAST(len(kept) AS INT) AS lines_kept
    FROM lines
    """,
)
def q_ext_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line filter (min words, terminal punctuation, boilerplate
    blacklist) over a deterministically synthesized multi-line corpus.

    split → array filter → array_join column algebra; per-row, no shuffle.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.substring("text", 1, 60), F.lit(".")),
            F.lit("Enable JavaScript to continue browsing."),
            F.lit("too short"),
            F.concat(F.lit("config = { "), F.substring("text", 61, 20), F.lit(" }")),
            F.concat(F.substring("text", 81, 40), F.lit(" all done.")),
        ).alias("text"),
    )
    return clean_lines(docs, "text")


# ---------------------------------------------------------------------------
# Deterministic shuffle shards
# ---------------------------------------------------------------------------


@register(
    "q_ext_shuffle_shards",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('3:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS k
      FROM documents
    )
    SELECT doc_id,
           CAST(k % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY k % 8 ORDER BY k, doc_id) - 1 AS INT) AS pos
    FROM h
    """,
)
def q_ext_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards: shard + dense
    in-shard position, both pure functions of (doc_id, seed).

    Shard-partitioned windows — never a global single-partition sort; at
    1000 executors each window sorts 1/8 of the corpus in parallel.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", n_shards=8, seed=3)
