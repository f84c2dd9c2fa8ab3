"""Corpus curation: benchmark decontamination + the composed
keep/drop decision — the last mile of a training-data pipeline, stacking
the per-document signals (language, quality, exact-dup role,
contamination) into one audited verdict per document.

Net-new vs the reference (its domain is feature engineering; these are
the corpus-cleaning twins of its validation gates). Both operators are
pure column algebra + equi-joins:

- :func:`ngram_contamination` — documents sharing ≥ ``min_overlap``
  word-k-gram(s) with a benchmark/eval set (the standard train-set
  decontamination test). Candidate generation is a semi-join on the
  60-bit shingle hash: the eval side is tiny relative to the corpus, so
  Spark broadcasts it and no corpus shuffle happens at all. At 100 TB
  with a large eval suite the same shape holds with the eval shingle set
  pre-aggregated; a broadcast Bloom filter over eval hashes is the
  constant-memory variant (same contract, probabilistic "maybe
  contaminated" needing the exact join only for hits).
- :func:`curate_corpus` — one row per document with every filter flag
  and the final ``kept`` verdict. Flags instead of silent dropping:
  curation decisions must be auditable (why did this doc fall out?) and
  re-weightable without recomputing the signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from databricks_demo_feature_store_spark.textops.analysis import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
)
from databricks_demo_feature_store_spark.textops.dedup import with_shingle_hashes


def _bloom_bits(n_items: int, fpp: float) -> int:
    """Optimal Bloom bit count for ``n_items`` at false-positive rate
    ``fpp``: ``-n·ln(p) / (ln 2)²`` (standard sizing formula)."""
    import math

    return max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_fpp: float | None = None,
    bloom_expected_items: int = 1_000_000,
) -> DataFrame:
    """Per-document count of distinct word-``k``-grams shared with the
    eval set, for documents sharing at least ``min_overlap``.

    Returns (doc_id, n_shared_ngrams). Documents with zero overlap are
    absent (semi-join semantics); callers wanting flags left-join this
    back (see :func:`curate_corpus`).

    ``bloom_fpp`` enables the constant-memory scale path: the eval
    shingle hashes aggregate into ONE Bloom filter (the pure-DataFrame
    ``bloom_build`` from ``operators/sketches.py`` — engine-portable bit
    positions, a few MB regardless of eval-set size) that pre-filters the exploded
    corpus BEFORE the exact join — at 100 TB the overwhelmingly-clean
    corpus drops ~(1 − fpp) of its shingle rows at scan speed, and only
    the survivors reach the join/distinct machinery. The result is still
    EXACT: Bloom filters have no false negatives and the exact broadcast
    join verifies every survivor, so false positives cost work, never
    correctness (the gate checks this path against the same oracle as
    the plain one).
    """
    # explode_outer, NOT explode: Catalyst's InferFiltersFromGenerate adds a
    # size(arr) > 0 filter under a plain explode and pushes it below the
    # staged projections, re-inlining the whole shingle+md5 pipeline into a
    # second per-row evaluation (measured 4x). The outer variant infers no
    # filter; the null rows from empty docs drop in a cheap post-filter on
    # the generated attribute.
    corpus = (
        with_shingle_hashes(docs, text_col, k, "__hs")
        .select(F.col(id_col).alias("doc_id"), F.explode_outer("__hs").alias("h"))
        .where(F.col("h").isNotNull())
    )
    eval_hashes = (
        with_shingle_hashes(eval_docs, text_col, k, "__hs")
        .select(F.explode_outer("__hs").alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    if bloom_fpp is not None:
        from databricks_demo_feature_store_spark.operators.sketches import (
            bloom_build,
            bloom_might_contain_col,
        )

        n_bits = _bloom_bits(bloom_expected_items, bloom_fpp)
        bloom = bloom_build(eval_hashes, "h", n_bits=n_bits)
        corpus = (
            corpus.crossJoin(F.broadcast(bloom))
            .where(bloom_might_contain_col(F.col("bloom"), F.col("h"), n_bits=n_bits))
            .drop("bloom")
        )
    shared = corpus.join(F.broadcast(eval_hashes), on="h").select("doc_id", "h").distinct()
    return (
        shared.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        .where(F.col("n_shared_ngrams") >= min_overlap)
    )


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    languages: tuple[str, ...] = ("en",),
    quality_threshold: float = 0.5,
    contamination_k: int = 3,
    contamination_min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed curation verdict: one row per document with

    - ``lang_ok`` — marker language ID lands in ``languages``
    - ``quality_ok`` — composite quality score ≥ threshold
    - ``dedup_keep`` — document is its exact-dup group's representative
      (min doc id per fingerprint); duplicates lose
    - ``not_contaminated`` — no ``contamination_k``-gram overlap with the
      eval set (vacuously true when ``eval_docs`` is None)
    - ``kept`` — AND of the four

    Two shuffles total (fingerprint groupBy + the contamination count);
    language/quality are codegen'd column algebra, the dedup winner rides
    a single aggregation joined back on the fingerprint, and the eval
    side broadcasts.
    """
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        lang_id_col(t).alias("__lang"),
        quality_score_col(t).alias("__q"),
        fingerprint_col(t).alias("__fp"),
    )
    reps = base.groupBy("__fp").agg(F.min("doc_id").alias("__rep"))
    flagged = base.join(reps, on="__fp")

    if eval_docs is not None:
        contaminated = ngram_contamination(
            docs, eval_docs, contamination_k, contamination_min_overlap, text_col, id_col
        ).withColumn("__dirty", F.lit(True))
        flagged = flagged.join(contaminated.select("doc_id", "__dirty"), on="doc_id", how="left")
    else:
        flagged = flagged.withColumn("__dirty", F.lit(None).cast("boolean"))

    out = flagged.select(
        "doc_id",
        F.col("__lang").isin(list(languages)).alias("lang_ok"),
        (F.col("__q") >= quality_threshold).alias("quality_ok"),
        (F.col("doc_id") == F.col("__rep")).alias("dedup_keep"),
        F.coalesce(~F.col("__dirty"), F.lit(True)).alias("not_contaminated"),
    )
    return out.withColumn(
        "kept",
        F.col("lang_ok") & F.col("quality_ok") & F.col("dedup_keep") & F.col("not_contaminated"),
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.8,
    corpus_id: str = "vec_id",
    bench_id: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """EMBEDDING-level benchmark decontamination: flag corpus items whose
    cosine to ANY benchmark item reaches ``threshold`` — the semantic
    complement of :func:`ngram_contamination` (paraphrased or reformatted
    eval items share no shingles but keep high embedding similarity,
    which is how modern pipelines catch GSM8K-style contamination).

    Returns one row per CONTAMINATED corpus item: its best benchmark
    match and the (rounded) cosine — ``(corpus_id, bench_id, cosine)``,
    ties on rounded cosine resolving to the smallest benchmark id
    (deterministic). Drop flagged ids from the corpus with a left-anti
    join.

    Scale shape: the benchmark side is TINY by construction (eval suites
    are 10²–10⁵ items) and broadcasts; the corpus is scanned ONCE with a
    per-row fold over the broadcast benchmark — no shuffle of corpus
    vectors at all, and the per-corpus-item max collapses map-side. For
    benchmark sides too large to broadcast, block both sides with the
    sign-LSH machinery (`textops/similarity.py sign_bucket_col`) first —
    same verify step, banded candidates instead of the full fold.
    """
    from databricks_demo_feature_store_spark.functions.rounding import dround
    from databricks_demo_feature_store_spark.textops.similarity import cosine_col

    b = benchmark.select(
        F.col(bench_id).alias("__bid"), F.col(vec_col).alias("__bvec")
    )
    scored = (
        corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cvec"))
        .crossJoin(F.broadcast(b))
        .select(
            "__cid",
            "__bid",
            dround(cosine_col(F.col("__cvec"), F.col("__bvec")), round_to).alias(
                "__cos"
            ),
        )
        .filter(F.col("__cos") >= F.lit(float(threshold)))
    )
    return (
        scored.groupBy("__cid")
        .agg(
            # (cos DESC, bid ASC) winner via min_by over (-cos, bid):
            # the negation stays on the always-double cosine, never on
            # the id, so string/any-orderable benchmark ids work
            F.min_by(
                F.col("__bid"),
                F.struct((-F.col("__cos")).alias("__nc"), F.col("__bid")),
            ).alias("__best_bid"),
            F.max("__cos").alias("__best_cos"),
        )
        .select(
            F.col("__cid").alias(corpus_id),
            F.col("__best_bid").alias("bench_id"),
            F.col("__best_cos").alias("cosine"),
        )
    )
