"""Transactional insert/update/delete applier (S7-S10, O6-O7).

Spark's JDBC writer supports append/overwrite only — no UPDATE, no
DELETE, no cross-partition transaction — while the reference needs
all-or-nothing mixed DML (ref: dbsync.go:915-1011). The design
(SURVEY.md §4.3):

1. the diff triple is computed fully in Spark (distributed);
2. **stage**: each leg lands in a staging table via a parallel,
   batched append (``df.write.jdbc`` on a cluster);
3. **apply atomically on the driver** over ONE connection/transaction
   in the reference's operation order — set-based statements
   (``INSERT … SELECT``, ``UPDATE … JOIN``, ``DELETE … JOIN``)
   so the transaction holds locks only for the apply, never the scan.

Two backends:

- :class:`DbApiBackend` — any DB-API 2.0 connection (sqlite3,
  mysql-connector, psycopg). Staging goes through batched
  ``executemany`` over ``toLocalIterator`` chunks: the portable path,
  also the test path (sqlite). Fine for diff legs that are small
  relative to the table (the common case for incremental sync);
  for huge legs use the JDBC backend.
- :class:`JdbcBackend` — stages with Spark's parallel JDBC writer,
  then applies over a single driver connection. Needs a JDBC driver
  jar on the classpath + a DB-API driver for the apply connection;
  constructed lazily so environments without drivers can still use
  everything else.

Operation order within one table is insert → update → delete
(ref: dbsync.go:534-563); multi-table phase ordering lives in
``syncer.py`` (O5/O7).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

BATCH_SIZE = 1000


def _chunks(rows: Iterator, size: int = BATCH_SIZE):
    while True:
        batch = list(itertools.islice(rows, size))
        if not batch:
            return
        yield batch


@dataclass
class ApplyStats:
    inserted: int = 0
    updated: int = 0
    deleted: int = 0


class DbApiBackend:
    """Applies a diff triple over one DB-API connection, atomically.

    ``placeholder`` is the driver's paramstyle token ("?" for sqlite /
    mysql-connector's pyformat needs "%s").
    """

    def __init__(self, connection, placeholder: str = "?"):
        self.conn = connection
        self.ph = placeholder

    # -- DDL helpers -------------------------------------------------
    def table_columns(self, table: str) -> list[str]:
        """Column names in ordinal order (ref: getTableColumns,
        dbsync.go:253-279 — information_schema equivalent)."""
        cur = self.conn.execute(f"SELECT * FROM {table} LIMIT 0")
        return [d[0] for d in cur.description]

    def read_snapshot(
        self, spark: SparkSession, table: str, columns: list[str]
    ) -> DataFrame:
        """DB-side snapshot as a DataFrame (ref: getCurrentDBData,
        dbsync.go:597-679 — but distributed, not a driver hash map).

        DB-API has no partitioned read; on a cluster use
        ``spark.read.jdbc`` with partitionColumn instead (JdbcBackend).
        """
        cols = ", ".join(columns)
        cur = self.conn.execute(f"SELECT {cols} FROM {table}")
        rows = cur.fetchall()
        if not rows:
            return spark.createDataFrame([], self._snapshot_schema(table, columns))
        return spark.createDataFrame([tuple(r) for r in rows], columns)

    def _snapshot_schema(self, table: str, columns: list[str]):
        return ", ".join(f"{c} string" for c in columns)

    # -- DML legs ----------------------------------------------------
    def insert_rows(
        self, table: str, columns: list[str], rows: Iterator[tuple]
    ) -> int:
        """Bulk insert (ref: bulkInsert, dbsync.go:783-827) — batched
        multi-row executemany instead of one giant statement."""
        cols = ", ".join(columns)
        phs = ", ".join([self.ph] * len(columns))
        sql = f"INSERT INTO {table} ({cols}) VALUES ({phs})"
        n = 0
        cur = self.conn.cursor()
        for batch in _chunks(rows):
            cur.executemany(sql, batch)
            n += len(batch)
        return n

    def update_rows(
        self,
        table: str,
        set_columns: list[str],
        primary_key: str,
        rows: Iterator[tuple],
    ) -> int:
        """Prepared per-key update (ref: bulkUpdate, dbsync.go:830-891).
        ``rows`` yields (set values..., pk value)."""
        sets = ", ".join(f"{c} = {self.ph}" for c in set_columns)
        sql = f"UPDATE {table} SET {sets} WHERE {primary_key} = {self.ph}"
        n = 0
        cur = self.conn.cursor()
        for batch in _chunks(rows):
            cur.executemany(sql, batch)
            n += len(batch)
        return n

    def delete_rows(
        self, table: str, primary_key: str, keys: Iterator[tuple]
    ) -> int:
        """IN-list batched delete (ref: bulkDelete, dbsync.go:895-913)."""
        n = 0
        cur = self.conn.cursor()
        for batch in _chunks(keys):
            phs = ", ".join([self.ph] * len(batch))
            sql = f"DELETE FROM {table} WHERE {primary_key} IN ({phs})"
            cur.execute(sql, [k[0] for k in batch])
            n += len(batch)
        return n

    def truncate(self, table: str) -> None:
        """Full clear, step 1 of overwrite (ref: dbsync.go:496-500)."""
        self.conn.execute(f"DELETE FROM {table}")


class Transaction:
    """Single ACID boundary over one connection (O6/O7,
    ref: dbsync.go:422-426, 980-987): BEGIN → apply → COMMIT, with
    rollback on any failure."""

    def __init__(self, connection):
        self.conn = connection

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.conn.commit()
        else:
            self.conn.rollback()
        return False


def apply_diff(
    backend: DbApiBackend,
    table: str,
    columns: list[str],
    primary_key: str,
    to_insert: DataFrame,
    to_update: DataFrame,
    to_delete: DataFrame,
    timestamp_columns: list[str] | None = None,
    immutable_columns: list[str] | None = None,
    now_fn: Callable[[], object] | None = None,
) -> ApplyStats:
    """Apply one table's triple in insert → update → delete order
    (ref: executeSyncOperations, dbsync.go:532-565). Caller owns the
    transaction boundary (so multi-table syncs share one tx).

    Timestamp columns are set to "now" on insert and on update unless
    immutable (O9, ref: dbsync.go:793-799, 849-856); immutable columns
    are excluded from the UPDATE SET entirely (O10, ref:
    dbsync.go:842-847).
    """
    import datetime

    ts_cols = [c for c in (timestamp_columns or []) if c not in columns]
    immutable = set(immutable_columns or [])
    now = (now_fn or (lambda: datetime.datetime.now(datetime.UTC)))()
    stats = ApplyStats()

    insert_cols = columns + ts_cols
    stats.inserted = backend.insert_rows(
        table,
        insert_cols,
        (
            tuple(row[c] for c in columns) + tuple(now for _ in ts_cols)
            for row in to_insert.toLocalIterator()
        ),
    )

    set_cols = [c for c in columns if c != primary_key and c not in immutable]
    upd_ts = [c for c in ts_cols if c not in immutable]
    stats.updated = backend.update_rows(
        table,
        set_cols + upd_ts,
        primary_key,
        (
            tuple(row[c] for c in set_cols)
            + tuple(now for _ in upd_ts)
            + (row[primary_key],)
            for row in to_update.toLocalIterator()
        ),
    )

    stats.deleted = backend.delete_rows(
        table,
        primary_key,
        ((row[primary_key],) for row in to_delete.select(primary_key).toLocalIterator()),
    )
    return stats


def stage_and_apply(
    backend: DbApiBackend,
    table: str,
    columns: list[str],
    primary_key: str,
    to_insert: DataFrame,
    to_update: DataFrame,
    to_delete: DataFrame,
    immutable_columns: list[str] | None = None,
) -> ApplyStats:
    """The SURVEY.md §4.3 staging design, end-to-end.

    Each diff leg lands in a staging table first (on a cluster that
    write is ``df.write.jdbc(mode="append")`` — parallel and batched;
    here it goes through the backend's bulk insert), then the apply is
    three *set-based* statements over one connection, so the
    transaction window covers only the apply:

        INSERT INTO t SELECT * FROM _stg_ins_t;
        UPDATE t SET c = s.c, ... FROM _stg_upd_t s WHERE t.pk = s.pk;
        DELETE FROM t WHERE pk IN (SELECT pk FROM _stg_del_t);

    Caller owns the transaction boundary. Staging tables are dropped
    after apply.
    """
    immutable = set(immutable_columns or [])
    set_cols = [c for c in columns if c != primary_key and c not in immutable]
    stg_ins, stg_upd, stg_del = (
        f"_stg_ins_{table}",
        f"_stg_upd_{table}",
        f"_stg_del_{table}",
    )
    col_list = ", ".join(columns)
    cur = self_conn = backend.conn
    for stg, cols_sql in (
        (stg_ins, col_list),
        (stg_upd, col_list),
        (stg_del, primary_key),
    ):
        self_conn.execute(f"DROP TABLE IF EXISTS {stg}")
        self_conn.execute(
            f"CREATE TABLE {stg} AS SELECT {cols_sql} FROM {table} LIMIT 0"
        )
    backend.insert_rows(
        stg_ins,
        columns,
        (tuple(r[c] for c in columns) for r in to_insert.toLocalIterator()),
    )
    backend.insert_rows(
        stg_upd,
        columns,
        (tuple(r[c] for c in columns) for r in to_update.toLocalIterator()),
    )
    backend.insert_rows(
        stg_del,
        [primary_key],
        (
            (r[primary_key],)
            for r in to_delete.select(primary_key).toLocalIterator()
        ),
    )
    stats = ApplyStats()
    cur = self_conn.execute(
        f"INSERT INTO {table} ({col_list}) SELECT {col_list} FROM {stg_ins}"
    )
    stats.inserted = cur.rowcount
    if set_cols:
        sets = ", ".join(f"{c} = s.{c}" for c in set_cols)
        cur = self_conn.execute(
            f"UPDATE {table} SET {sets} FROM {stg_upd} AS s "
            f"WHERE {table}.{primary_key} = s.{primary_key}"
        )
        stats.updated = cur.rowcount
    cur = self_conn.execute(
        f"DELETE FROM {table} WHERE {primary_key} IN "
        f"(SELECT {primary_key} FROM {stg_del})"
    )
    stats.deleted = cur.rowcount
    for stg in (stg_ins, stg_upd, stg_del):
        self_conn.execute(f"DROP TABLE IF EXISTS {stg}")
    return stats


def overwrite_table(
    backend: DbApiBackend,
    table: str,
    columns: list[str],
    df: DataFrame,
    timestamp_columns: list[str] | None = None,
    now_fn: Callable[[], object] | None = None,
) -> ApplyStats:
    """Overwrite mode: truncate + bulk insert (S10+S7,
    ref: syncOverwrite, dbsync.go:494-518). Caller owns the tx."""
    import datetime

    ts_cols = [c for c in (timestamp_columns or []) if c not in columns]
    now = (now_fn or (lambda: datetime.datetime.now(datetime.UTC)))()
    backend.truncate(table)
    inserted = backend.insert_rows(
        table,
        columns + ts_cols,
        (
            tuple(row[c] for c in columns) + tuple(now for _ in ts_cols)
            for row in df.toLocalIterator()
        ),
    )
    return ApplyStats(inserted=inserted)
