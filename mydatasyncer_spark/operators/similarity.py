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

from mydatasyncer_spark.operators.partitioning import (
    cluster_parallelism,
    fanout_spread,
)


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
    # Norms are projected per vector BEFORE the join — inside the
    # pair space they would be recomputed |corpus| times per query.
    # The corpus side is round-robin spread so the per-pair work is
    # as wide as the cluster even when the input is one small split.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = fanout_spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("cn"),
        )
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
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


def hyperplane_values(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i of plane p
    maps a 48-bit md5 of ``"p:i"`` into [-1, 1). Computed driver-side
    (the inputs are constants) so Spark and any SQL oracle inline the
    IDENTICAL double literals — bucket ids then agree bit-for-bit."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:12], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def _hyperplane(dim: int, plane: int) -> Column:
    return F.array(*[F.lit(v) for v in hyperplane_values(dim, plane)])


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
        norm(F.col(vec_col)).alias("qn"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = fanout_spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("cn"),
            lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
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
    salt_factor: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold within a blocking
    key (label here; LSH bucket or coarse quantizer at scale).

    The within-block self-join is SALTED: side a is keyed by
    ``id % salt_factor``, side b replicated to every salt, and the
    join runs on (block, salt). Join parallelism is then
    #blocks × salt_factor instead of #blocks — a handful of hot
    blocks would otherwise serialize the O(block²) cosine work no
    matter how many executors exist. Both sides are repartitioned to
    a pinned width on the join key so AQE (which only sees the small
    pre-pair-space bytes) cannot coalesce the stage. Norms are
    projected per vector, not per pair."""
    n = cluster_parallelism(df)
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
        (F.col(id_col) % salt_factor).cast("int").alias("salt"),
    ).repartition(n, "blk", "salt")
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>")
        ).alias("salt"),
    ).repartition(n, "blk", "salt")
    return (
        a.join(b, ["blk", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
