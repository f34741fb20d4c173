"""Full-run SQL script emission: the exact ordered statement sequence
of one staged multi-table diff sync, as executable text.

The live path (`syncer._run_staged` + `sinks.applier`) executes this
sequence through a DB-API/JDBC connection; this module renders the
SAME sequence — staging DDL + loads outside the transaction, then
START TRANSACTION → FK-ordered deletes (child → parent) → upserts
(parent → child) → COMMIT, then staging drops — as literal SQL a DBA
could run verbatim with a MySQL client. It exists because this
sandbox has no MySQL server (ref: compose.yml:1-19 runs MySQL 8.0 for
dbsync_test.go): the emitted script is pinned byte-for-byte in
``tests/golden/mysql_full_sync.sql``, shrinking the live-MySQL gap to
pure connectivity.

Ordering mirrors ``Syncer._run_staged`` exactly (same
``DependencyGraph.sync_order()`` call), so a drift between the
executor and the script is a test failure, not a silent divergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime

from mydatasyncer_spark.dag import DependencyGraph
from mydatasyncer_spark.sinks.dialects import Dialect, get_dialect


@dataclass(frozen=True)
class TableScript:
    """One table's share of the run: its shape plus the already-diffed
    legs as literal rows (tuples ordered like ``columns`` for inserts
    and updates; bare primary-key values for deletes)."""

    name: str
    columns: list[str]
    primary_key: str
    dependencies: list[str] = field(default_factory=list)
    insert_rows: list[tuple] = field(default_factory=list)
    update_rows: list[tuple] = field(default_factory=list)
    delete_keys: list[object] = field(default_factory=list)
    immutable_columns: list[str] = field(default_factory=list)

    @property
    def set_columns(self) -> list[str]:
        return [
            c
            for c in self.columns
            if c != self.primary_key and c not in self.immutable_columns
        ]


def sql_literal(value: object, dialect: Dialect) -> str:
    """Render a Python value as a SQL literal for ``dialect``. MySQL
    treats backslash as an escape by default (NO_BACKSLASH_ESCAPES
    off), so both ``'`` and ``\\`` are doubled there."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, datetime):
        # sqlite has no typed date literals (dates ride as TEXT)
        if dialect.name == "sqlite":
            return f"'{value.strftime('%Y-%m-%d %H:%M:%S')}'"
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(value, date):
        if dialect.name == "sqlite":
            return f"'{value.isoformat()}'"
        return f"DATE '{value.isoformat()}'"
    s = str(value).replace("'", "''")
    if dialect.name in ("mysql", "mariadb"):
        s = s.replace("\\", "\\\\")
    return f"'{s}'"


def _insert_values_sql(
    dialect: Dialect, table: str, columns: list[str], rows: list[tuple]
) -> str:
    cols = ", ".join(dialect.quote(c) for c in columns)
    vals = ", ".join(
        "(" + ", ".join(sql_literal(v, dialect) for v in row) + ")"
        for row in rows
    )
    return f"INSERT INTO {dialect.quote(table)} ({cols}) VALUES {vals}"


def emit_sync_script(
    tables: list[TableScript], dialect: str | Dialect = "mysql"
) -> list[str]:
    """The complete ordered statement list of one staged multi-table
    diff sync. Pure function of its inputs — no connection, no Spark.

    Sequence (matching ``Syncer._run_staged``):

    1. OUTSIDE the transaction, parent → child: create the three
       staging tables per table and load them with literal INSERTs
       (MySQL DDL implicit-commits, so staging must not share the
       apply transaction; the live path loads via the parallel JDBC
       writer, which issues the same multi-row INSERTs).
    2. ``START TRANSACTION``.
    3. Phase A — deletes, child → parent, so no child row ever
       references a parent deleted earlier in the same phase.
    4. Phase B — inserts then updates, parent → child, so every FK
       target exists before its referents arrive.
    5. ``COMMIT``.
    6. OUTSIDE the transaction: drop the staging tables.
    """
    d = get_dialect(dialect)
    graph = DependencyGraph({t.name: list(t.dependencies) for t in tables})
    insert_order, delete_order = graph.sync_order()
    by_name = {t.name: t for t in tables}

    stmts: list[str] = []
    # -- 1: staging DDL + loads (no transaction) ---------------------
    for name in insert_order:
        t = by_name[name]
        legs = (
            ("insert", t.columns, t.insert_rows),
            ("update", t.columns, t.update_rows),
            ("delete", [t.primary_key], [(k,) for k in t.delete_keys]),
        )
        for kind, cols, rows in legs:
            stg = d.staging_name(kind, t.name)
            stmts.append(d.create_staging_sql(stg, t.name, cols))
            if rows:
                stmts.append(_insert_values_sql(d, stg, cols, rows))
    # -- 2-5: the one global transaction -----------------------------
    stmts.append(d.begin_stmt)
    for name in delete_order:
        t = by_name[name]
        stmts.append(
            d.staged_delete_sql(
                t.name, t.primary_key, d.staging_name("delete", t.name)
            )
        )
    for name in insert_order:
        t = by_name[name]
        stmts.append(
            d.staged_insert_sql(
                t.name, t.columns, d.staging_name("insert", t.name)
            )
        )
        if t.set_columns:
            stmts.append(
                d.staged_update_sql(
                    t.name,
                    t.set_columns,
                    t.primary_key,
                    d.staging_name("update", t.name),
                )
            )
    stmts.append("COMMIT")
    # -- 6: cleanup (no transaction) ---------------------------------
    for name in insert_order:
        t = by_name[name]
        for kind in ("insert", "update", "delete"):
            stmts.append(d.drop_staging_sql(d.staging_name(kind, t.name)))
    return stmts
