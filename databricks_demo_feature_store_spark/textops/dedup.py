"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Design for 100 TB:

- Exact dedup is a hash-groupBy on a fingerprint (one shuffle of (hash,
  id), never of the documents themselves).
- Near-dup never does an all-pairs comparison. Candidate generation is an
  **inverted-index / LSH-bucket equi-join** (shuffle on shingle or bucket
  key), verification runs only on candidate pairs. This is the
  MinHash-banding scheme of Broder (1997) / Leskovec-Rajaraman-Ullman
  ch.3, as deployed in web-scale corpus dedup (e.g. GPT-3/C4 pipelines).
- The hash is a **portable md5-derived 60-bit integer** (``conv(substr(
  md5(x),1,15),16,10)``) so results are engine-independent and
  oracle-checkable — Spark's builtin ``hash``/``xxhash64`` are faster but
  engine-specific; swap via ``hash_col`` if parity isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround
from databricks_demo_feature_store_spark.textops.analysis import fingerprint_col


def portable_hash_col(col: Column, seed: int | str = 0) -> Column:
    """Deterministic 60-bit integer hash portable across engines."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of normalized text.

    ``transform`` over a token-index sequence keeps this a pure column
    expression (no explode needed until the caller wants one).
    """
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    toks = F.split(norm, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.when(n > 0, F.array(norm)).otherwise(F.array().cast("array<string>")))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact-duplicate group.

    Hash-groupBy on the md5 fingerprint of normalized text — the shuffle
    carries (fingerprint, id) only.
    """
    fp = df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fingerprint"))
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All exact-duplicate groups: fingerprint, group size, representative id."""
    fp = df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("representative_id")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index join, exact similarity)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard-similar pairs via a shingle inverted index.

    shingle-explode → self-join on shingle (only docs sharing ≥1 shingle
    ever meet — no all-pairs) → per-pair common-shingle count →
    ``J = common / (|A| + |B| - common)`` → filter ≥ threshold.

    At scale the shingle join is the standard inverted-index candidate
    generator; hot shingles should be pre-filtered (df > stop-shingle
    threshold) — exposed via the MinHash variant below which bounds
    candidate fan-out by construction.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), k).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))
    exploded = sh.select("id", "n_shingles", F.explode("shingles").alias("shingle"))
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(b, on="shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_shingles").alias("n_a"),
            F.col("b.n_shingles").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        pairs.withColumn("jaccard", dround(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature: for seed i, min over shingles of
    hash(i, shingle). Pure column algebra (transform + array_min) — the
    signature never leaves the row, so this is shuffle-free."""
    sh = shingles_col(F.col(text_col), k)
    sig = F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: portable_hash_col(s, seed=i))
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become candidates.

    Band key = md5 of the band's signature slice → equi-join on
    (band, key). Probability a pair with Jaccard s collides:
    ``1 - (1 - s^r)^b`` (the S-curve that makes this sublinear).
    """
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.band_key")
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(b2, on=["band", "band_key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash pipeline: signatures → LSH candidates → exact-Jaccard
    verification of candidates only."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, k, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band)

    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), k).alias("shingles")
    )
    a = sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"})
    b = sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"})
    verified = (
        cands.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn(
            "jaccard",
            dround(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_col(text: Column, bits: int = 16) -> Column:
    """SimHash over word tokens (Charikar 2002): per bit, sum ±1 votes of
    each token's hash bit; bit set iff the vote is positive.

    ``bits`` defaults to 16 so the per-row work (bits × tokens bit-tests)
    stays cheap; the token hash is the portable md5 hash so the result is
    engine-independent.
    """
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    toks = F.array_distinct(F.split(norm, " "))
    hashes = F.transform(toks, lambda t: portable_hash_col(t, seed="simhash"))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1),
        )
        for i in range(bits)
    ]
    out = F.lit(0).cast("long")
    for i, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 2,
    block_bits: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation by the pigeonhole trick: split the hash into
    ``max_hamming + 1``-ish blocks (``block_bits`` each); any pair within
    the distance budget must agree exactly on ≥1 block → equi-join on
    (block_idx, block_value), then verify with bit_count(xor).
    """
    h = df.select(F.col(id_col).alias("id"), simhash_col(F.col(text_col), bits).alias("sh"))
    nblocks = bits // block_bits
    mask = (1 << block_bits) - 1
    blocked = h.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("sh", i * block_bits).bitwiseAND(F.lit(mask)).alias("blkval"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("b"),
    ).select("id", "sh", "b.blk", "b.blkval")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on=["blk", "blkval"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
