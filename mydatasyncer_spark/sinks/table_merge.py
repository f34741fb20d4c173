"""Native Spark-table merge sink — the MERGE INTO alternative.

SURVEY.md §4.3 names lakehouse ``MERGE INTO`` as the worth-offering
alternative to the JDBC apply when the sync target is a Spark table
rather than an operational database (the reference has no analogue;
its only sink is MySQL, ref: dbsync.go:915-1011). Delta/Iceberg
aren't available in this environment, so this implements the same
copy-on-write contract over plain managed parquet tables:

- **partition-scoped rewrite**: with a ``partition_column``, only the
  partitions the source touches are recomputed and replaced (dynamic
  partition overwrite) — the 100 TB shape, where a daily increment
  touching 3 of 3,000 date partitions rewrites 0.1% of the table,
  exactly like a Delta MERGE's file-level copy-on-write but at
  partition granularity.
- **upsert + optional delete semantics** matching the diff applier:
  target rows not matched keep their data, matched rows are replaced
  by the source row, source-only rows are inserted, and
  ``delete_not_in_source`` drops target rows missing from the source
  (within affected partitions only, mirroring the reference's
  deleteNotInFile scoping).

The merged slice is ``localCheckpoint``-materialized before the
overwrite: Spark refuses to overwrite files it is still reading
(self-read), and the checkpoint is precisely the copy in
copy-on-write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MergeStats:
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    partitions_rewritten: int | None = None


def merge_into_table(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    primary_key: str,
    partition_column: str | None = None,
    delete_not_in_source: bool = False,
    compute_stats: bool = True,
) -> MergeStats:
    """Merge ``source`` into managed table ``table`` by primary key.

    With ``partition_column`` the table must be partitioned by that
    column and only affected partitions are rewritten (dynamic
    overwrite); without it the whole table is rewritten (small-table
    path). ``compute_stats=False`` skips the three count jobs — at
    scale the counts are an extra pass over the affected slice.

    Crash window (honest caveat, restored r14): the rewrite is an
    unstaged ``insertInto(overwrite=True)`` — a crash inside its job
    commit can leave an affected partition partially replaced.
    Re-running the merge from the same source converges (the merge
    derives each affected partition's full contents from source +
    target's UNAFFECTED rows... for ``delete_not_in_source=True``
    entirely from source), EXCEPT the ``delete_not_in_source=False``
    path, whose ``kept`` leg re-reads the possibly-torn partition;
    pair with a transactional format if that window matters.
    ``insertInto`` honors only the SESSION ``partitionOverwriteMode``
    conf (the per-write option is ignored for catalog tables —
    verified on Spark 4.1), so the dynamic toggle is session-wide
    for the write's duration; don't run concurrent
    partition-overwrite writers on the same session.
    """
    target = spark.table(table)
    stats = MergeStats()

    if partition_column is not None:
        # partition pruning on the target: only the slice the source
        # touches participates in the join or the rewrite
        parts = [
            r[0]
            for r in source.select(partition_column).distinct().collect()
        ]
        stats.partitions_rewritten = len(parts)
        affected = target.filter(F.col(partition_column).isin(parts))
    else:
        affected = target

    if delete_not_in_source:
        # survivors of the affected slice are exactly the source rows:
        # matched rows take the source version, unmatched target rows
        # are dropped, source-only rows are inserted
        merged = source.select(*affected.columns)
    else:
        kept = affected.join(source, on=primary_key, how="left_anti")
        merged = kept.unionByName(source.select(*affected.columns))
    if compute_stats:
        stats.updated = affected.join(
            source, on=primary_key, how="left_semi"
        ).count()
        stats.inserted = source.count() - stats.updated
        if delete_not_in_source:
            stats.deleted = affected.count() - stats.updated

    # materialize before overwriting the files being read (CoW copy)
    merged = merged.localCheckpoint()

    writer_conf = spark.conf
    prev = writer_conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        if partition_column is not None:
            writer_conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.insertInto(table, overwrite=True)
    finally:
        if prev is not None:
            writer_conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            writer_conf.unset("spark.sql.sources.partitionOverwriteMode")
    return stats
