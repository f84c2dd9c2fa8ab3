"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

- **Brute-force cosine top-k** — exact baseline. One pass over the corpus
  per query batch; the dot product is a JVM-side ``aggregate``/``zip_with``
  over the arrays (no Python). For a single query vector the query side is
  a broadcast 1-row dim.
- **Sign-LSH bucketed ANN** — random-hyperplane LSH (Charikar 2002)
  degenerate form using coordinate signs (deterministic, engine-portable):
  bucket = sign-bit string of the first ``nbits`` coordinates; search only
  inside the query's bucket (optionally ± multiprobe neighbors). At scale
  buckets shard the corpus so a query touches 1/2^nbits of it; swap the
  sign pattern for true random hyperplanes (dot with broadcast gaussian
  vectors) when recall matters more than parity-testability.
- **Embedding-cosine near-dup** — all candidate pairs inside a bucket with
  cosine ≥ threshold; the embedding-space twin of MinHash dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround


def dot_col(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k of every query row against the corpus.

    ``query`` is broadcast (queries ≪ corpus); per query the top-k is a
    TakeOrdered — no global sort of the corpus.
    """
    qid = query_id_col or id_col
    q = query.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        dround(cosine_col(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def sign_bucket_col(vec: Column, nbits: int = 8) -> Column:
    """Deterministic LSH bucket: concatenated sign bits of the first
    ``nbits`` coordinates."""
    return F.concat(
        *[
            F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(nbits)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's sign
    bucket. Equi-join on the bucket key replaces the cross join — the scan
    per query drops by ~2^nbits."""
    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col), F.col(vec_col), sign_bucket_col(F.col(vec_col), nbits).alias("bucket")
    )
    q = query.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        sign_bucket_col(F.col(vec_col), nbits).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), on="bucket").select(
        "query_id",
        id_col,
        dround(cosine_col(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 6,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH blocking: pairs
    sharing a bucket with cosine ≥ threshold."""
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket_col(F.col(vec_col), nbits).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, on="bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dround(cosine_col(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cluster-sharded scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the ``nlist`` corpus vectors with
    the smallest md5(id) become centroids — a reproducible pseudo-random
    sample (TakeOrdered, no global sort). Swap for k-means|| (MLlib) when
    recall matters more than cross-engine reproducibility; the index
    structure below is identical either way."""
    return (
        corpus.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid")
        )
        .orderBy(F.md5(F.col("centroid_id").cast("string")).asc(), F.col("centroid_id").asc())
        .limit(nlist)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    centroid id as tie-break). One pass: corpus × broadcast(nlist)."""
    from pyspark.sql import Window as W

    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        "centroid_id",
        cosine_col(F.col(vec_col), F.col("centroid")).alias("__cos"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("__cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("cluster"))
    )


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` clusters whose
    centroids are nearest each query — per query ~nprobe/nlist of the
    corpus is scored. At 100 TB the assignment is computed once and
    persisted partitioned BY cluster, so a probe is a partition-pruned
    scan, not a shuffle."""
    from pyspark.sql import Window as W

    qid = query_id_col or id_col
    cents = ivf_centroids(corpus, nlist, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    q = query.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec"))
    qscore = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "__qvec",
        "centroid_id",
        cosine_col(F.col("__qvec"), F.col("centroid")).alias("__cos"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("centroid_id"))
    probes = (
        qscore.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", F.col("centroid_id").alias("cluster"))
    )

    scored = assigned.join(F.broadcast(probes), on="cluster").select(
        "query_id",
        id_col,
        dround(cosine_col(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
