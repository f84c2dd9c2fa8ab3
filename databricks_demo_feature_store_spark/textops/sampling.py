"""Deterministic sampling and packing operators for training-data
curation: stratified corpus downsampling and token-budget sharding.

Net-new vs the reference (it has no corpus-curation surface); these are
the standard steps between dedup/quality-filter and tokenizer sharding
in a large-scale LLM data pipeline.

Design for 100 TB:

- Sampling is a **pure filter** on a deterministic per-row hash — no
  shuffle, no rand() (reruns, retried tasks, and other engines all pick
  the SAME rows; Bernoulli `rand()` sampling is not reproducible across
  retries and cannot be oracle-checked).
- Sharding is one window over (partition, order) — a single sort
  exchange, the same discipline as the feature windows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround
from databricks_demo_feature_store_spark.textops.dedup import portable_hash_col

# Hash-bucket resolution for sampling rates: rates are quantized to
# 1/RESOLUTION so the keep-predicate compares integers (no float edge).
RESOLUTION = 1_000_000


def sample_bucket_col(key: Column, seed: int | str = 0) -> Column:
    """Deterministic bucket in [0, RESOLUTION) from the portable 60-bit
    hash of the row key — the same row lands in the same bucket in any
    engine, on any rerun."""
    return F.pmod(portable_hash_col(key.cast("string"), seed), F.lit(RESOLUTION))


def deterministic_stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int | str = 0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    ``rates`` maps stratum value → sampling fraction (e.g. downweight
    over-represented languages/sources). Unlisted strata use
    ``default_rate``. Expected kept fraction per stratum equals the rate
    to within 1/RESOLUTION; the selection is exactly reproducible.
    """
    threshold = F.lit(int(default_rate * RESOLUTION))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * RESOLUTION))
        ).otherwise(threshold)
    return df.where(sample_bucket_col(F.col(key_col), seed) < threshold)


def weighted_k_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    weight_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """Exactly ``k`` rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` — Efraimidis & Spirakis (2006,
    *Weighted random sampling with a reservoir*): each row draws a
    deterministic hash-uniform u ∈ (0,1) and the k largest
    ``u^(1/w)`` win, which is distribution-identical to sequential
    weighted draws. Ranking by ``log(u)/w`` (same order, one
    transcendental) via the distributed global rank — no
    single-partition window, no reservoir state, exactly reproducible
    across runs and engines. Rows with weight <= 0 or NULL never
    qualify.

    This is how a quality-weighted training subset gets drawn at corpus
    scale: one pass, no rand(), and re-running with a bigger k keeps
    every previously selected row (the E-S keys don't change).
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_rank,
    )

    # full 60-bit uniform (not the RESOLUTION=1e6 bucketing the rate
    # samplers use): at 1e6 granularity u collisions are guaranteed above
    # ~1e6 rows and equal-weight ties would fall back to lexicographic key
    # order — a deterministic bias toward low keys. 2^60 keys collide at
    # ~2^-60; the int64→double cast rounds identically in any IEEE engine.
    u = (
        portable_hash_col(F.col(key_col).cast("string"), seed).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    # maximize u^(1/w)  ⇔  maximize log(u)/w (log u < 0, w > 0)
    es_key = F.when(w > 0, F.log(u) / w)
    eligible = df.where(es_key.isNotNull())
    ranked = attach_global_rank(
        eligible,
        [es_key.desc(), F.col(key_col).asc()],
        rank_col="__ws_rank",
    )
    return ranked.where(F.col("__ws_rank") <= int(k)).select(*df.columns)


def exact_k_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """EXACTLY ``k`` rows (not a fraction in expectation), sampled
    uniformly and reproducibly: the k smallest portable key hashes win.
    The hash order is a fixed random permutation of the keys, so the
    selection is uniform, stable across runs/engines/partitionings, and
    composable (the k-sample is a prefix of the (k+m)-sample — growing a
    fixture never reshuffles previously selected rows).

    Built on ``attach_global_rank`` (range-partitioned distributed rank
    over the hash order): no single-partition window, no driver-side
    top-k. The rate-based :func:`deterministic_stratified_sample` is the
    zero-shuffle path when "about p percent" is acceptable; this is the
    exact-count path (eval fixtures, labeling budgets, golden sets).
    ``key_col`` must be unique per row for the output size to be exactly
    min(k, rows); duplicate keys are kept or dropped together.
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_rank,
    )

    order = [
        portable_hash_col(F.col(key_col).cast("string"), seed).asc(),
        F.col(key_col).asc(),
    ]
    ranked = attach_global_rank(df, order, rank_col="__eks_rank")
    return ranked.where(F.col("__eks_rank") <= int(k)).select(*df.columns)


def token_budget_shards(
    df: DataFrame,
    token_col: str,
    partition_col: str,
    order_col: str,
    budget: int = 2048,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign consecutive docs (by ``order_col`` within ``partition_col``)
    to shards of ~``budget`` tokens: shard = floor(tokens-before / budget).

    This is the streaming-friendly form of sequence packing for training
    batches — one window (single sort exchange), no driver loop, and a
    doc spilling over a boundary starts the next shard (shards can
    overshoot by at most one doc, they never undershoot).
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn("cum_tokens", cum).withColumn(
        shard_col,
        F.floor((F.col("cum_tokens") - F.col(token_col)) / F.lit(budget)).cast("int"),
    )


def token_budget_mixture(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    key_col: str,
    budgets: Mapping[str, int],
    seed: int | str = 0,
) -> DataFrame:
    """Data-mixture sampling: keep documents per stratum (source, domain,
    language, …) until that stratum's TOKEN budget is filled — the
    standard "mix N billion tokens of web with M billion of code" recipe,
    as a deterministic operator.

    Docs are ordered inside each stratum by their sample-bucket hash (a
    deterministic shuffle — no rand(), so reruns and other engines pick
    the same docs) and kept while the running token total BEFORE the doc
    is under the stratum's budget — so budgets can overshoot by at most
    one document, never undershoot while eligible docs remain (same
    boundary rule as :func:`token_budget_shards`). Unlisted strata are
    dropped.

    One window (single sort exchange on the stratum key); strata are the
    window partitions, so the 100 TB failure mode is a single giant
    stratum — pre-split such strata on a salted sub-key and give each
    split ``budget / n_splits``.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(sample_bucket_col(F.col(key_col).cast("string"), seed), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(None).cast("long")
    for stratum, b in budgets.items():
        budget = F.when(F.col(strata_col) == stratum, F.lit(int(b))).otherwise(budget)
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return (
        df.withColumn("__budget", budget)
        .withColumn("__cum_before", cum_before)
        .where(F.col("__budget").isNotNull() & (F.col("__cum_before") < F.col("__budget")))
        .drop("__budget", "__cum_before")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------


def hashed_ngram_features_col(text: Column, n_buckets: int = 8192) -> Column:
    """DSIR's featurization: word unigrams + bigrams of normalized text,
    hashed into ``n_buckets`` integer buckets (one array per doc, with
    multiplicity — repeated features count repeatedly, matching the
    bag-of-hashed-ngrams model). Unigrams and bigrams are tag-prefixed
    (``u:`` / ``b:``) before hashing so the two feature types cannot
    collide by string equality."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    toks = F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    unis = F.transform(toks, lambda w: F.concat(F.lit("u:"), w))
    bis = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.lit("b:"),
                F.element_at(toks, i),
                F.lit(" "),
                F.element_at(toks, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(unis, bis),
        lambda s: F.pmod(portable_hash_col(s), F.lit(n_buckets)),
    )


def dsir_importance_weights(
    source: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    target_filter=None,
) -> DataFrame:
    """Per-document log importance weight of raw-pool docs toward a target
    domain — Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): fit hashed-n-gram bag models of the target sample and the raw
    source pool, then score every source doc by
    ``log w(x) = Σ_features ln(p_target(b) / q_source(b))`` with
    Laplace-smoothed bucket probabilities. Select by taking the top
    weights (or Gumbel-resampling on them) to shift a 100 TB crawl
    toward the target domain (e.g. score CommonCrawl against a
    Wikipedia+books sample).

    Scale shape: both distributions are ``n_buckets``-row aggregates
    (map-side combinable, then a broadcast-size table — 8k rows no
    matter the corpus size); scoring is one explode + one broadcast join
    + one per-doc sum. Nothing shuffles except the per-doc aggregation,
    keyed on the doc id.

    Output: (doc_id, n_feats, log_weight); docs with no features (empty
    text) get NULL weight. Determinism: per-bucket log ratios are
    rounded (6 dp) before the exact DECIMAL per-doc sum.

    When the target sample IS a subset of the source pool, pass
    ``target_filter`` (a boolean Column over source rows, e.g.
    ``F.col("lang") == "en"``) instead of ``target``: the md5-per-feature
    featurization then runs ONCE over the source and the target
    distribution is a filter of the same pass (guide §1.2/§2.3 — the
    target pass duplicated ~40 % of the featurization CPU; profiled
    r15: the two hash passes were the top-2 stages of this operator).
    Identical by construction: ``feats(source.where(p))`` ≡
    ``feats(source).where(p)`` row-for-row (featurization is per-row).
    """
    if (target is None) == (target_filter is None):
        raise ValueError("pass exactly one of target / target_filter")

    def feats(df: DataFrame, extra: Sequence = ()) -> DataFrame:
        carried = ["__tgt"] if extra else []
        return (
            df.select(
                F.col(id_col).alias("doc_id"),
                hashed_ngram_features_col(F.col(text_col), n_buckets).alias("__f"),
                *extra,
            )
            .select("doc_id", F.explode_outer("__f").alias("bucket"), *carried)
        )

    # The source-side hashed features feed the source distribution, the
    # ratio table's broadcast subjob AND the scoring join — materialize
    # once (lineage-truncated) or the md5-per-feature pass runs 3×.
    if target_filter is not None:
        src_feats = feats(
            source, extra=[target_filter.alias("__tgt")]
        ).localCheckpoint(eager=False)
        tgt_feats = src_feats.where(F.col("__tgt"))
    else:
        src_feats = feats(source).localCheckpoint(eager=False)
        tgt_feats = feats(target)
    tgt_counts = (
        tgt_feats
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    src_counts = (
        src_feats.where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    tgt_total = tgt_counts.agg(F.sum("ct").alias("nt"))
    src_total = src_counts.agg(F.sum("cs").alias("ns"))
    ratios = (
        tgt_counts.join(src_counts, on="bucket", how="full_outer")
        .crossJoin(F.broadcast(tgt_total))
        .crossJoin(F.broadcast(src_total))
        .select(
            "bucket",
            dround(
                F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                     / (F.col("nt") + F.lit(alpha) * F.lit(n_buckets)))
                    / ((F.coalesce(F.col("cs"), F.lit(0)) + F.lit(alpha))
                       / (F.col("ns") + F.lit(alpha) * F.lit(n_buckets)))
                ),
                6,
            ).alias("__lr"),
        )
    )
    scored = src_feats.where(F.col("bucket").isNotNull()).join(
        F.broadcast(ratios), on="bucket"
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_feats"),
        dround(
            F.sum(F.col("__lr").cast("decimal(25,6)")).cast("double"), 6
        ).alias("log_weight"),
    )
    base = source.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        "log_weight",
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into token-bounded chunks with overlap — the
    standard pre-tokenization step that turns variable-length documents
    into training-window-sized pieces while preserving context across
    chunk boundaries (stride = ``chunk_tokens − overlap``).

    Chunk i covers token positions ``[i·stride, i·stride + chunk_tokens)``;
    the last chunk may be short; a document shorter than one chunk yields
    exactly one chunk; empty docs yield none. Output: one row per chunk
    with (doc_id, chunk_idx, n_chunk_tokens, chunk_text).

    Pure column algebra: tokenize once, build the chunk-index sequence,
    ONE explode, then `slice` + `concat_ws` re-materializes each chunk's
    text — no shuffle at all (narrow op), so at 100 TB this runs at scan
    speed and the output partitioning inherits the input's. No Python,
    no UDFs.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    toks = F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    staged = df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks")).select(
        "doc_id", "__toks", F.size("__toks").alias("__n")
    )
    # number of chunks = 1 + ceil(max(n - chunk, 0) / stride) for n > 0
    n_chunks = F.when(F.col("__n") <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.ceil(
            F.greatest(F.col("__n") - chunk_tokens, F.lit(0)) / F.lit(stride)
        ).cast("int")
    )
    # Pre-slice every chunk BEFORE the explode: exploding chunk indices
    # and slicing afterwards would carry the document's FULL token array
    # on every chunk row (a 10k-token doc × 20 chunks = 20× width
    # amplification through the generate); pre-sliced, each output row
    # holds only its own ≤chunk_tokens piece and the full array
    # materializes once per document.
    pieces = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - 1),
            lambda i: F.slice(F.col("__toks"), i * stride + 1, chunk_tokens),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    chunked = staged.select(
        "doc_id", F.posexplode_outer(pieces).alias("chunk_idx", "__piece")
    ).where(F.col("__piece").isNotNull())
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("__piece").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("__piece")).alias("chunk_text"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int | str = 0,
) -> DataFrame:
    """Keep at most ``cap`` documents per key (domain, source, site …) —
    the RefinedWeb/C4-style anti-boilerplate guard against any single
    origin dominating the corpus.

    Selection is a deterministic per-key hash ranking (the same docs
    survive on any rerun, any partitioning, any engine — no rand()),
    tie-broken by id: one window, one sort exchange on the key. At
    100 TB the giant-key failure mode is the window partition for a
    mega-domain; since only the TOP ``cap`` rows per key matter, a
    pre-filter on rank-eligible buckets (or the salted-split trick in
    :func:`token_budget_mixture`) bounds it.
    """
    w = Window.partitionBy(key_col).orderBy(
        sample_bucket_col(F.col(id_col).cast("string"), seed), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= cap)
        .drop("__rank")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int | str = "pack",
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay the whole corpus out as
    one deterministic token stream and cut it into fixed ``seq_len``
    training bins (the GPT-style packing that wastes zero tokens to
    padding), returning the slice bookkeeping
    ``(bin_id, doc_id, doc_offset, bin_offset, slice_len, n_tokens)`` —
    one row per (document, bin) intersection.

    Order is a deterministic pseudo-random shuffle (portable hash of the
    doc id, tie-broken by id), so bins mix domains/sources instead of
    preserving crawl locality, and any engine/partitioning/rerun
    produces the identical packing. Empty documents are skipped.

    Scale shape: ONLY ``(doc_id, n_tokens)`` ever moves — token counts
    flow through :func:`attach_global_cumsum`'s distributed prefix sum
    (range exchange + per-partition windows + broadcast offsets; no
    single-partition window), then each document's token span
    ``[start, end)`` explodes to its covered bins (fan-out
    ~n_tokens/seq_len + 1, proportional to output size). The text
    itself never shuffles; a consumer materializes packed examples by
    joining the slices back on the doc id and slicing token arrays
    per bin — a co-partitioned join at corpus scale.

    Invariants (property-tested): per-bin ``slice_len`` sums to exactly
    ``seq_len`` for every bin except the last; per-document slices
    tile ``[0, n_tokens)`` contiguously; ``bin_offset`` is consistent
    with the running layout.
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_cumsum,
    )
    from databricks_demo_feature_store_spark.textops.analysis import token_count_col

    L = int(seq_len)
    if L < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            token_count_col(F.col(text_col)).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            portable_hash_col(F.col("doc_id").cast("string"), seed).alias("__ord"),
        )
    )
    cum = attach_global_cumsum(
        base, order=[F.col("__ord"), F.col("doc_id")], value_cols=["n_tokens"]
    )
    spans = cum.select(
        "doc_id",
        "n_tokens",
        (F.col("cum_n_tokens") - F.col("n_tokens")).alias("__start"),
        F.col("cum_n_tokens").alias("__end"),
    )
    rows = spans.select(
        "doc_id",
        "n_tokens",
        "__start",
        "__end",
        F.explode(
            F.sequence(
                F.floor(F.col("__start") / L), F.floor((F.col("__end") - 1) / L)
            )
        ).alias("bin_id"),
    )
    lo = F.greatest(F.col("__start"), F.col("bin_id") * L)
    hi = F.least(F.col("__end"), (F.col("bin_id") + 1) * L)
    return rows.select(
        F.col("bin_id").cast("long").alias("bin_id"),
        "doc_id",
        (lo - F.col("__start")).cast("int").alias("doc_offset"),
        (lo - F.col("bin_id") * L).cast("int").alias("bin_offset"),
        (hi - lo).cast("int").alias("slice_len"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


def exact_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """EXACTLY ``min(k, group size)`` rows PER GROUP, sampled uniformly
    and reproducibly — balanced eval fixtures, per-language labeling
    budgets, per-source golden sets. Within each group the ``k``
    smallest portable key-hashes win (a fixed random permutation per
    group: uniform, stable across runs/engines/partitionings, and
    prefix-composable — a (k+m)-per-group sample extends the k-per-group
    sample without reshuffling it).

    Scale shape: one ``row_number`` window PARTITIONED BY the group —
    the data shuffles once on the group key and each task ranks only its
    groups (this is the partitioned-window fast path, not the
    single-task global window :func:`exact_k_sample` exists to avoid;
    a skewed mega-group degrades to one task ranking that group — for a
    heavy-tailed grouping, pre-split hot groups with a salt and take
    ``k/salt`` per split). ``key_col`` must be unique per row for exact
    group counts; duplicate keys keep or drop together.
    """
    if k < 1:
        raise ValueError("exact_k_per_group requires k >= 1")
    w = Window.partitionBy(group_col).orderBy(
        portable_hash_col(F.col(key_col).cast("string"), seed).asc(),
        F.col(key_col).asc(),
    )
    return (
        df.select("*", F.row_number().over(w).alias("__ekg_rank"))
        .where(F.col("__ekg_rank") <= int(k))
        .select(*df.columns)
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    test_fraction: float = 0.2,
    val_fraction: float = 0.0,
    seed: int | str = 42,
) -> DataFrame:
    """Train/val/test split that can never leak near-identical text
    across sides: documents are grouped by their exact-dedup fingerprint
    and the WHOLE GROUP is assigned by a deterministic hash of the
    group's representative id — the eval-contamination rule row-level
    splits break the moment the corpus contains duplicates (the same
    document lands in train AND test with probability ≈ the duplicate
    rate).

    One fingerprint hash agg + a join-back; the split column itself is
    the engine's deterministic `train_test_split_col` (no rand(), stable
    across runs, engines, partitionings). Returns (id, split).
    """
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        train_test_split_col,
    )
    from databricks_demo_feature_store_spark.textops.dedup import fingerprint_col

    fp = df.select(
        F.col(id_col), fingerprint_col(F.col(text_col)).alias("__fp")
    )
    rep = fp.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
    return fp.join(rep, "__fp").select(
        id_col,
        train_test_split_col(
            F.col("__rep"), test_fraction=test_fraction,
            val_fraction=val_fraction, seed=seed,
        ).alias("split"),
    )
