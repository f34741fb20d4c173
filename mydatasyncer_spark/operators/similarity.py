"""Similarity search over embedding columns (SURVEY.md §7 M4).

- :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline. The query side is broadcast (it is small by construction)
  so the big side streams through without a shuffle; ranking is a
  per-query-key window.
- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH
  bucketing; candidates only within matching buckets, then exact
  re-rank. Hyperplanes are derived from the deterministic hash48
  family, so results are reproducible across runs and engines.

Vector math uses ``zip_with`` + ``aggregate`` — JVM-side higher-order
functions over ``array<float>``, summing in array order (which is
what makes the DuckDB ``list_dot_product`` oracle agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mydatasyncer_spark.functions.hashing import hash48


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    Output: (query_id, neighbor_id, rank, cosine). Deterministic
    tie-break: higher cosine first, then smaller neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component i of plane p
    maps hash48("p:i") into [-1, 1). Reproducible everywhere."""
    comps = [
        (hash48(F.lit(f"{plane}:{i}")) % F.lit(2_000_001)).cast("double")
        / F.lit(1_000_000.0)
        - F.lit(1.0)
        for i in range(dim)
    ]
    return F.array(*comps)


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket id from ``n_planes`` random hyperplanes."""
    bucket: Column = F.lit(0)
    for p in range(n_planes):
        positive = dot(vec, _hyperplane(dim, p)) > 0
        bucket = bucket + F.when(positive, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    then exact cosine re-rank within the bucket.

    At 100 TB the bucket column is precomputed/partitioned-by at
    ingest, making each query a partition-pruned scan instead of a
    full pass. Recall tunes with ``n_planes`` (fewer planes → bigger
    buckets → higher recall, more compute).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold within a blocking
    key (label here; LSH bucket or coarse quantizer at scale)."""
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
