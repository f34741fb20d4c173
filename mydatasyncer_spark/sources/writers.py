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
    """Write hive-partitioned output with exactly
    ``files_per_partition`` files per partition directory.

    A repartition on (partition cols [+ salt]) routes all rows of one
    output directory to ``files_per_partition`` tasks — one shuffle,
    then every task writes whole files. Raise ``files_per_partition``
    when single partition values are too big for one file (it also
    bounds per-task memory)."""
    if files_per_partition <= 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % files_per_partition)
        shaped = df.withColumn("_salt", salt).repartition(
            *[F.col(c) for c in partition_cols], F.col("_salt")
        ).drop("_salt")
    (
        shaped.write.format(fmt)
        .partitionBy(*partition_cols)
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
