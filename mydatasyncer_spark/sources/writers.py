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


def file_key_ranges(
    spark, path: str, key_col: str, fmt: str = "parquet"
) -> list[tuple[str, float, float]]:
    """Per-file (path, min, max) of ``key_col`` for a written layout.

    One narrow scan — column pruning means only the key column's
    pages are read; a production deployment would read parquet
    footers (or a manifest/metastore) and skip even that, but the
    contract is the same: file-level key ranges as a BOUNDED list
    (one row per file, not per data row).
    """
    df = spark.read.format(fmt).load(path)
    rows = (
        df.groupBy(F.input_file_name().alias("_file"))
        .agg(F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi"))
        .collect()
    )
    return [(r["_file"], r["_lo"], r["_hi"]) for r in rows]


def copy_files(spark, files: list[str], out_path: str) -> None:
    """Raw filesystem copy of data files into ``out_path`` (keeping
    names) — zero decode; on object stores this is a server-side
    copy. The metadata move of incremental layout maintenance."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    out_dir = path_cls(out_path)
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(out_dir.toUri(), conf)
    fs.mkdirs(out_dir)
    for f in files:
        src = path_cls(f)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            fs, src, fs, path_cls(out_path, src.getName()), False, conf
        )


def merge_into_range_sorted(
    spark,
    old_path: str,
    new_df: DataFrame,
    out_path: str,
    sort_cols: list[str],
    fmt: str = "parquet",
) -> dict:
    """Incremental maintenance of a :func:`write_range_sorted` layout:
    fold ``new_df`` in while REWRITING ONLY the files whose key range
    the new rows actually touch.

    The 100 TB shape: a daily batch lands in a few key ranges of a
    petabyte layout. A full re-sort re-shuffles everything; here the
    untouched files are moved to the new layout version by raw
    filesystem copy (zero decode — server-side copy on object
    stores), and only the intersecting ranges (plus out-of-range new
    rows) go through Spark's range sort. The merged layout keeps the
    invariant: file ranges don't overlap, rows sorted within files.

    Leading ``sort_cols[0]`` drives the range pruning; the full list
    orders rows inside rewritten files. Returns
    ``{"copied": n, "rewritten": n, "new_files": n}``.
    """
    key = sort_cols[0]
    ranges = file_key_ranges(spark, old_path, key, fmt)
    lo = new_df.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    new_lo, new_hi = lo["lo"], lo["hi"]
    touched, untouched = [], []
    if new_lo is None:  # empty batch: everything copies
        untouched = [f for f, _, _ in ranges]
    else:
        for f, flo, fhi in ranges:
            if flo is None or (flo <= new_hi and new_lo <= fhi):
                touched.append((f, flo, fhi))
            else:
                untouched.append(f)
    copy_files(spark, untouched, out_path)
    rewrite = new_df
    if touched:
        rewrite = (
            spark.read.format(fmt)
            .load([f for f, _, _ in touched])
            .unionByName(new_df)
        )
    n_files = max(len(touched), 1)
    (
        rewrite.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode("append")
        .save(out_path)
    )
    return {
        "copied": len(untouched),
        "rewritten": len(touched),
        "new_files": n_files,
    }
