"""Partition-shaping helpers for fan-out-heavy operators.

AQE sizes shuffle partitions by the bytes flowing INTO an exchange.
For a stage whose per-row cost explodes AFTER the exchange (shingle
explode, per-pair cosine, Arrow-batched feature extraction) that
estimate undercounts the work by the fan-out factor, so a small
input collapses to one partition and the whole stage runs on one
core. These helpers pin the width instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_parallelism(df: DataFrame) -> int:
    spark = df.sparkSession
    return max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )


def fanout_repartition(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by key with a PINNED partition count before a
    per-row fan-out. A bare ``repartition(col)`` participates in AQE
    coalescing and can collapse to one partition; pinning to the
    cluster's parallelism keeps the fan-out wide. At scale the input
    split count dominates the max, so this stays a no-op-sized
    shuffle of the small pre-fan-out rows."""
    return df.repartition(cluster_parallelism(df), F.col(key_col))


def fanout_spread(df: DataFrame) -> DataFrame:
    """Round-robin variant for fan-outs with no natural key (e.g. a
    probe side that joins against a broadcast build side)."""
    return df.repartition(cluster_parallelism(df))


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Widen ONLY if the input is narrower than the cluster.

    For heavy-payload stages (binary columns into ``mapInPandas``) an
    unconditional repartition would shuffle every payload byte even
    when the source already has thousands of splits — so this checks
    the actual partition count first and is a no-op at scale."""
    n = cluster_parallelism(df)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top_n`` heaviest keys with
    their row counts, share of the table, and the ratio to the mean
    key load — the number that says whether this key needs salting
    (ratio >> 1) or AQE's skew-join split will carry it.

    One groupBy + one tiny aggregate, broadcast back over the top-N
    rows; nothing driver-side. Read it as: a 100 TB join shuffling on
    this key puts ``share`` of the table into one task per listed key;
    a ``ratio_to_mean`` of R means that task runs ~R× longer than the
    average — salt by ~ceil(R) to level it.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").cast("double").alias("_total"),
        F.avg("n").alias("_mean"),
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        "key",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        F.round(F.col("n") / F.col("_mean"), 4).alias("ratio_to_mean"),
    )
