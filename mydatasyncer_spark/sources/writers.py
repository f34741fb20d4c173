"""Partitioned-output writers — layout control for pipeline outputs.

The naive ``df.write.partitionBy(...)`` lets EVERY task write a file
into EVERY partition directory it has rows for: tasks × partitions
small files, the classic 100 TB output pathology (downstream scans
pay per-file open cost and planning time). These writers shape the
data to the layout first, so file counts are chosen, not accidental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned output with at most
    ``files_per_partition`` files per partition directory (exactly
    that many when the salt groups land in distinct tasks).

    A repartition on (partition cols [+ salt]) routes all rows of one
    output directory to ``files_per_partition`` tasks — one shuffle,
    then every task writes whole files. Raise ``files_per_partition``
    when single partition values are too big for one file (it also
    bounds per-task memory)."""
    if files_per_partition <= 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        from mydatasyncer_spark.operators.partitioning import (
            cluster_parallelism,
        )

        # pmod, not %: Spark's % keeps the dividend's sign, so a raw
        # modulo would yield salts in (-(f-1))..(f-1) — up to 2f-1
        # groups — breaking the files_per_partition contract
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        # pinned width: a bare repartition(cols) is AQE-coalescible
        # and collapses small inputs to one task, silently reducing
        # every directory to a single file
        shaped = df.withColumn("_salt", salt).repartition(
            max(cluster_parallelism(df), files_per_partition),
            *[F.col(c) for c in partition_cols],
            F.col("_salt"),
        ).drop("_salt")
    (
        shaped.write.format(fmt)
        .partitionBy(*partition_cols)
        .mode(mode)
        .save(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned layout with rows *clustered* on ``sort_cols``
    inside every file.

    Parquet writes min/max stats per row group; a downstream filter on
    a sort column then skips whole row groups (and, with one file per
    partition, whole files). The shape step is the same one-shuffle
    routing as :func:`write_partitioned`; the only addition is a
    task-local sort (``sortWithinPartitions`` — no extra shuffle, the
    sort happens in the writing task's spillable buffer)."""
    if files_per_partition <= 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        from mydatasyncer_spark.operators.partitioning import (
            cluster_parallelism,
        )

        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        shaped = df.withColumn("_salt", salt).repartition(
            max(cluster_parallelism(df), files_per_partition),
            *[F.col(c) for c in partition_cols],
            F.col("_salt"),
        ).drop("_salt")
    (
        shaped.sortWithinPartitions(*partition_cols, *sort_cols)
        .write.format(fmt)
        .partitionBy(*partition_cols)
        .mode(mode)
        .save(path)
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Total-order layout: ``num_files`` files whose key ranges don't
    overlap (file k's max key <= file k+1's min key), each internally
    sorted.

    ``repartitionByRange`` samples the sort keys to pick balanced
    split points (so skew in the key distribution yields equal-sized
    files, not equal-width ranges), then a task-local sort orders each
    file. Point/range scans on the leading sort column touch one file
    (or a contiguous few) instead of all of them — the layout to feed
    a downstream engine that prunes by footer stats."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def compact(
    spark_df: DataFrame,
    path: str,
    target_partitions: int,
    fmt: str = "parquet",
) -> None:
    """Rewrite a dataset into ``target_partitions`` files (small-file
    compaction for an already-written, unpartitioned layout)."""
    spark_df.repartition(target_partitions).write.format(fmt).mode(
        "overwrite"
    ).save(path)
