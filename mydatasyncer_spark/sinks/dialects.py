"""SQL dialect generation for the staged set-based apply (S7-S9).

The reference targets MySQL (ref: dbsync.go:830-891 emits
``UPDATE t SET c=? WHERE pk=?`` per row; compose.yml runs MySQL 8.0),
but the staged apply needs *set-based* statements whose syntax varies
by engine:

- ``update_from``       — SQLite (>=3.33) / PostgreSQL:
  ``UPDATE t SET c = s.c FROM stg AS s WHERE t.pk = s.pk``
- ``update_join``       — MySQL / MariaDB:
  ``UPDATE t JOIN stg AS s ON t.pk = s.pk SET t.c = s.c``
- ``scalar_subquery``   — ANSI fallback (Derby, Oracle):
  ``UPDATE t SET c = (SELECT s.c FROM stg s WHERE s.pk = t.pk)
  WHERE EXISTS (...)``

Identifiers are always quoted with the dialect's quote character so
the generated SQL matches tables created by Spark's JDBC writer
(which quotes, preserving case).
"""

from __future__ import annotations

from dataclasses import dataclass

#: update-statement flavors
UPDATE_FROM = "update_from"
UPDATE_JOIN = "update_join"
SCALAR_SUBQUERY = "scalar_subquery"


@dataclass(frozen=True)
class Dialect:
    name: str
    quote_char: str = '"'
    update_style: str = UPDATE_FROM
    #: CTAS suffix producing an empty copy: "LIMIT 0" (sqlite/mysql/pg)
    #: vs ANSI "... WITH NO DATA" (derby)
    ctas_no_data: str = "LIMIT 0"
    #: explicit-transaction opener for emitted scripts (sqlite: BEGIN).
    #: NOTE: the ANSI dialect's "START TRANSACTION" is nominal for
    #: Derby — Derby has no transaction-start STATEMENT at all
    #: (transactions open implicitly; clients disable autocommit,
    #: e.g. ij's `autocommit off`), so an ANSI full-run script
    #: targeting Derby must strip/replace the delimiters with a
    #: connection-level autocommit toggle. The in-process Derby e2e
    #: tests drive the applier through JDBC (which manages the
    #: transaction on the connection), never through this script
    #: text, so the emitted SQL body itself is Derby-valid.
    begin_stmt: str = "START TRANSACTION"

    # -- identifiers -------------------------------------------------
    def quote(self, ident: str) -> str:
        q = self.quote_char
        return f"{q}{ident.replace(q, q * 2)}{q}"

    def staging_name(self, kind: str, table: str) -> str:
        # no leading underscore: ANSI identifiers must start with a
        # letter, and Spark's JDBC writer passes the name verbatim
        return f"stg_{kind}_{table}"

    # -- DDL ---------------------------------------------------------
    def create_staging_sql(
        self, staging: str, source_table: str, columns: list[str]
    ) -> str:
        cols = ", ".join(self.quote(c) for c in columns)
        select = f"SELECT {cols} FROM {self.quote(source_table)}"
        if self.ctas_no_data == "LIMIT 0":
            return f"CREATE TABLE {self.quote(staging)} AS {select} LIMIT 0"
        return f"CREATE TABLE {self.quote(staging)} AS {select} WITH NO DATA"

    def drop_staging_sql(self, staging: str) -> str:
        return f"DROP TABLE {self.quote(staging)}"

    # -- set-based apply (SURVEY.md §4.3 step 3) ---------------------
    def staged_insert_sql(
        self, table: str, columns: list[str], staging: str
    ) -> str:
        cols = ", ".join(self.quote(c) for c in columns)
        return (
            f"INSERT INTO {self.quote(table)} ({cols}) "
            f"SELECT {cols} FROM {self.quote(staging)}"
        )

    def staged_update_sql(
        self,
        table: str,
        set_columns: list[str],
        primary_key: str,
        staging: str,
    ) -> str:
        t, s = self.quote(table), self.quote(staging)
        pk = self.quote(primary_key)
        if self.update_style == UPDATE_JOIN:
            sets = ", ".join(
                f"{t}.{self.quote(c)} = s.{self.quote(c)}"
                for c in set_columns
            )
            return f"UPDATE {t} JOIN {s} AS s ON {t}.{pk} = s.{pk} SET {sets}"
        if self.update_style == SCALAR_SUBQUERY:
            sets = ", ".join(
                f"{self.quote(c)} = (SELECT s.{self.quote(c)} FROM {s} s "
                f"WHERE s.{pk} = {t}.{pk})"
                for c in set_columns
            )
            return (
                f"UPDATE {t} SET {sets} "
                f"WHERE EXISTS (SELECT 1 FROM {s} s WHERE s.{pk} = {t}.{pk})"
            )
        sets = ", ".join(
            f"{self.quote(c)} = s.{self.quote(c)}" for c in set_columns
        )
        return f"UPDATE {t} SET {sets} FROM {s} AS s WHERE {t}.{pk} = s.{pk}"

    def staged_delete_sql(
        self, table: str, primary_key: str, staging: str
    ) -> str:
        pk = self.quote(primary_key)
        return (
            f"DELETE FROM {self.quote(table)} WHERE {pk} IN "
            f"(SELECT {pk} FROM {self.quote(staging)})"
        )


SQLITE = Dialect("sqlite", '"', UPDATE_FROM, begin_stmt="BEGIN")
POSTGRES = Dialect("postgres", '"', UPDATE_FROM)
MYSQL = Dialect("mysql", "`", UPDATE_JOIN)
#: ANSI fallback; used for Derby (the in-process e2e test engine)
ANSI = Dialect("ansi", '"', SCALAR_SUBQUERY, ctas_no_data="WITH NO DATA")

_BY_NAME = {d.name: d for d in (SQLITE, POSTGRES, MYSQL, ANSI)}
_BY_NAME["derby"] = ANSI
_BY_NAME["mariadb"] = MYSQL
_BY_NAME["postgresql"] = POSTGRES


def get_dialect(name: str | Dialect) -> Dialect:
    if isinstance(name, Dialect):
        return name
    try:
        return _BY_NAME[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown SQL dialect {name!r}; known: {sorted(_BY_NAME)}"
        ) from None
