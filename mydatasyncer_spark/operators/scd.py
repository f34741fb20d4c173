"""Slowly-changing-dimension type-2 maintenance over diff deltas.

The reference's diff (insert/update/delete, ref: dbsync.go:717-760)
overwrites state; a warehouse usually wants HISTORY: every version of
a row kept, with [valid_from, valid_to) effectivity and an is_current
flag. SCD2 maintenance is exactly the diff triple re-targeted:

- insert  → open a new current version,
- update  → close the current version at ``ts``, open a new one,
- delete  → close the current version (no successor).

Scale shape: everything is equi joins / anti joins on the primary key
(the same legs as ``operators/diff``) plus one union — no windows, no
driver state. The emitted frame is the NEW history; with a
MERGE-capable store you'd apply ``closed`` and ``opened`` as two
set-based statements instead of rewriting (the applier's staged
protocol does exactly that for mutable sinks), and a partition-by-
is_current layout means the rewrite only ever touches the current
partition while closed history stays immutable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.diff import diff_snapshots

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_init(snapshot: DataFrame, ts: str) -> DataFrame:
    """Bootstrap a history table from a first snapshot: every row is
    the open current version effective at ``ts`` (a date/timestamp
    string literal)."""
    return snapshot.select(
        "*",
        F.lit(ts).cast("date").alias(VALID_FROM),
        F.lit(None).cast("date").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    primary_key: str,
    ts: str,
    columns: list[str] | None = None,
    diff_fn=None,
) -> DataFrame:
    """New history = history with the diff between the incoming
    ``snapshot`` and the CURRENT versions folded in at ``ts``.

    Closed-out rows keep their attribute values (the whole point of
    SCD2: the old version survives with ``valid_to = ts``); changed
    and brand-new rows open as current versions with
    ``valid_from = ts``. Rows absent from the snapshot close with no
    successor. Non-current history passes through untouched.

    ``diff_fn(snapshot, current, primary_key)`` defaults to the full
    :func:`~mydatasyncer_spark.operators.diff.diff_snapshots`; pass
    ``diff_snapshots_pruned`` (or a ``bucket_fn`` partial of it) for
    the daily-sync shape where changes are localized — the wide diff
    joins then only read the key buckets whose fingerprints changed,
    and since everything downstream is delta-sized, the WHOLE history
    update becomes proportional to the changed slice, not the corpus.
    """
    if columns is None:
        columns = [c for c in snapshot.columns]
    if diff_fn is None:
        diff_fn = diff_snapshots
    meta = [VALID_FROM, VALID_TO, IS_CURRENT]
    cur = history.filter(F.col(IS_CURRENT)).select(*columns, VALID_FROM)
    diff = diff_fn(
        snapshot.select(*columns), cur.select(*columns), primary_key
    )
    # keys whose current version must close: updated or deleted
    closing_keys = (
        diff.to_update.select(primary_key)
        .unionByName(diff.to_delete.select(primary_key))
    )
    # delta-sized key set: AQE broadcasts it when small, falls back to
    # a shuffle semi join when a reload changes everything
    closed = cur.join(closing_keys, primary_key, "left_semi").select(
        *columns,
        F.col(VALID_FROM),
        F.lit(ts).cast("date").alias(VALID_TO),
        F.lit(False).alias(IS_CURRENT),
    )
    surviving_current = cur.join(
        closing_keys, primary_key, "left_anti"
    ).select(
        *columns,
        F.col(VALID_FROM),
        F.lit(None).cast("date").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )
    opened = (
        diff.to_insert.select(*columns)
        .unionByName(diff.to_update.select(*columns))
        .select(
            *columns,
            F.lit(ts).cast("date").alias(VALID_FROM),
            F.lit(None).cast("date").alias(VALID_TO),
            F.lit(True).alias(IS_CURRENT),
        )
    )
    past = history.filter(~F.col(IS_CURRENT)).select(*columns, *meta)
    return (
        past.unionByName(closed)
        .unionByName(surviving_current)
        .unionByName(opened)
    )
