"""MySQL-syntax conformance without a MySQL server.

The sandbox has no MySQL container (ref runs compose.yml's MySQL 8.0
for dbsync_test.go), so the dialect's emitted SQL is pinned two ways:

1. **Golden file** — ``tests/golden/mysql_staged_apply.sql`` holds the
   exact statement sequence of one staged diff apply for a plain and a
   hostile identifier set; the test regenerates and byte-compares, so
   any drift in emitted SQL is an explicit, reviewed diff.
2. **Grammar check** — each statement must strip cleanly into a known
   MySQL 8.0 statement skeleton after removing backtick-quoted
   identifiers (with ``` `` ``` escapes), and no stray backtick may
   survive the strip. sqlglot would be used here if the environment
   had it; the skeleton check covers the same failure class (unbalanced
   quoting / malformed clause order) for these fixed shapes.
"""

from __future__ import annotations

import re
from pathlib import Path

from mydatasyncer_spark.sinks.dialects import MYSQL

GOLDEN = Path(__file__).parent / "golden" / "mysql_staged_apply.sql"


def lifecycle(table, columns, pk, set_columns):
    stmts = []
    for kind in ("insert", "update", "delete"):
        stg = MYSQL.staging_name(kind, table)
        cols = columns if kind != "delete" else [pk]
        stmts.append(MYSQL.create_staging_sql(stg, table, cols))
    stmts.append(
        MYSQL.staged_insert_sql(
            table, columns, MYSQL.staging_name("insert", table)
        )
    )
    stmts.append(
        MYSQL.staged_update_sql(
            table, set_columns, pk, MYSQL.staging_name("update", table)
        )
    )
    stmts.append(
        MYSQL.staged_delete_sql(
            table, pk, MYSQL.staging_name("delete", table)
        )
    )
    for kind in ("insert", "update", "delete"):
        stmts.append(
            MYSQL.drop_staging_sql(MYSQL.staging_name(kind, table))
        )
    return stmts


def all_statements():
    return lifecycle(
        "sync_target",
        ["id", "name", "value", "updated_at"],
        "id",
        ["name", "value", "updated_at"],
    ) + lifecycle(
        "order",
        ["id", "select", "col name", "wei`rd"],
        "id",
        ["select", "col name", "wei`rd"],
    )


def test_mysql_lifecycle_matches_golden_file():
    golden_stmts = [
        line[:-1]
        for line in GOLDEN.read_text().splitlines()
        if line and not line.startswith("--")
    ]
    assert all_statements() == golden_stmts


# identifier token: backtick-quoted, `` = literal backtick inside
_IDENT = r"`(?:[^`]|``)*`"

_SKELETONS = [
    rf"CREATE TABLE {_IDENT} AS SELECT {_IDENT}(?:, {_IDENT})* FROM {_IDENT} LIMIT 0",
    rf"INSERT INTO {_IDENT} \({_IDENT}(?:, {_IDENT})*\) SELECT {_IDENT}(?:, {_IDENT})* FROM {_IDENT}",
    rf"UPDATE {_IDENT} JOIN {_IDENT} AS s ON {_IDENT}\.{_IDENT} = s\.{_IDENT} SET {_IDENT}\.{_IDENT} = s\.{_IDENT}(?:, {_IDENT}\.{_IDENT} = s\.{_IDENT})*",
    rf"DELETE FROM {_IDENT} WHERE {_IDENT} IN \(SELECT {_IDENT} FROM {_IDENT}\)",
    rf"DROP TABLE {_IDENT}",
]


def test_every_statement_parses_as_mysql_shape():
    for sql in all_statements():
        assert any(
            re.fullmatch(sk, sql) for sk in _SKELETONS
        ), f"statement fits no MySQL skeleton: {sql}"
        # after removing identifier tokens no backtick may remain
        stripped = re.sub(_IDENT, "X", sql)
        assert "`" not in stripped, f"unbalanced backtick quoting: {sql}"


def test_identifier_escape_roundtrip():
    # `wei`rd` must be emitted with a DOUBLED backtick, never raw
    sql = MYSQL.staged_insert_sql("t", ["wei`rd"], "stg")
    assert "`wei``rd`" in sql
    assert "`wei`rd`" not in sql.replace("``", "")
