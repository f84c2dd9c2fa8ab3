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


# ---------------------------------------------------------------------------
# End-to-end curation composite: clean → redact → filter → dedup → sample
# → shard. The LLM-data-pipeline flagship: every stage is an operator
# verified on its own elsewhere; this proves they COMPOSE, value-exact.
# ---------------------------------------------------------------------------

_CUR_SYNTH_SQL = """
      SELECT doc_id, source,
        concat_ws(chr(10),
          concat(substr(text, 1, 60), '.'),
          'Enable JavaScript to continue browsing.',
          'Reach user@mail.example.com or 10.0.0.7 today.',
          '{ boilerplate }',
          concat(substr(text, 61, 60), ' end.')) AS text
      FROM documents
"""


@register(
    "q_ext_curation_pipeline",
    oracle=f"""
    WITH synth AS ({_CUR_SYNTH_SQL}),
    cleaned AS (
      SELECT doc_id, source,
             array_to_string(
               list_filter(string_split(text, chr(10)), l -> {_LINE_PRED_SQL}),
               chr(10)) AS text
      FROM synth
    ),
    red AS (
      SELECT doc_id, source,
             {_o_redact('text')} AS text,
             len(regexp_extract_all(text, '{PII_PATTERNS[0][1]}'))
           + len(regexp_extract_all(text, '{PII_PATTERNS[1][1]}'))
           + len(regexp_extract_all(text, '{PII_PATTERNS[2][1]}'))
           + len(regexp_extract_all(text, '{PII_PATTERNS[3][1]}'))
           + len(regexp_extract_all(text, '{PII_PATTERNS[4][1]}')) AS pii_total
      FROM cleaned
    ),
    prof AS (
      SELECT *,
             CASE WHEN trim(lower(text)) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
             END AS n_tokens
      FROM red
    ),
    filt AS (SELECT * FROM prof WHERE n_tokens >= 22),
    ded AS (
      SELECT * FROM filt
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    samp AS (
      SELECT * FROM ded
      WHERE CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
            % 1000000
            < CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 500000
                          ELSE 250000 END
    ),
    sh AS (
      SELECT *,
             CAST('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS k
      FROM samp
    )
    SELECT doc_id, source,
           CAST(k % 4 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY k % 4 ORDER BY k, doc_id) - 1 AS INT) AS pos,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(pii_total AS INT) AS pii_total,
           text
    FROM sh
    """,
)
def q_ext_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: C4 line filter → PII redaction → token
    quality filter → exact dedup (keep lowest id per fingerprint) →
    stratified source downsampling → deterministic shuffle shards.

    One linear chain: per-row algebra for the first four stages (zero
    shuffles), one window on the fingerprint for dedup, a pure-filter
    sample, and the shard-partitioned position windows — 3 shuffles total
    at any scale.
    """
    from pyspark.sql import Window
    from databricks_demo_feature_store_spark.textops.analysis import token_count_col
    from databricks_demo_feature_store_spark.textops.sampling import (
        deterministic_stratified_sample,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat_ws(
            "\n",
            F.concat(F.substring("text", 1, 60), F.lit(".")),
            F.lit("Enable JavaScript to continue browsing."),
            F.lit("Reach user@mail.example.com or 10.0.0.7 today."),
            F.lit("{ boilerplate }"),
            F.concat(F.substring("text", 61, 60), F.lit(" end.")),
        ).alias("text"),
    )
    cleaned = clean_lines(docs, "text").drop("lines_total", "lines_kept")
    red = scrub_pii(cleaned, "text").select(
        "doc_id", "source", "text", "pii_total"
    )
    prof = red.withColumn("n_tokens", token_count_col(F.col("text")))
    filt = prof.where(F.col("n_tokens") >= 22)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    ded = (
        filt.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    samp = deterministic_stratified_sample(
        ded,
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.5},
        "doc_id",
        default_rate=0.25,
        seed=7,
    )
    out = shuffle_shards(samp, "doc_id", n_shards=4, seed=11)
    return out.select(
        "doc_id", "source", "shard", "pos", "n_tokens", "pii_total", "text"
    )
