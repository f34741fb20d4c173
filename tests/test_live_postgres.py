"""LIVE-RDBMS execution of the emitted sync SQL (r11).

The reference proves its sync operators against a real MySQL 8.0
(ref: compose.yml:1-19; dbsync_test.go:17-104; final-state asserts
main_test.go:201-513). This sandbox has no MySQL daemon, but it DOES
ship PostgreSQL 15 — so the postgres-dialect rendering of the same
multi-table staged plan stops being golden TEXT and becomes a live
run: ``tests/golden/postgres_full_sync.sql`` is executed VERBATIM
(the exact pinned bytes, not a regeneration) against a real server
with REAL foreign-key enforcement, and the final state is asserted
main_test.go-style. FK enforcement is what makes the ordering proof
sharp: a wrong delete order (parent before child) or upsert order
(child before parent) fails loudly on a real engine instead of
passing silently as it would in a text diff.

A second run proves the all-or-nothing transaction contract on a
real engine: a poisoned in-transaction statement aborts the run and
the targets come back untouched (PostgreSQL rolls back the open
transaction on session exit).

The whole module SKIPS (never fails) when the PostgreSQL binaries
are absent or a cluster cannot be bootstrapped — the live run is an
upgrade over the golden files where the environment allows it, not a
new environment requirement. MySQL itself stays environment-blocked
(client CLI only, no daemon/containerd — re-verified r11); the
remaining MySQL gap is dialect TEXT, pinned by its golden file +
grammar check."""

from __future__ import annotations

import os
import shlex
import shutil
import subprocess
import tempfile
from pathlib import Path

import pytest

PG_BIN = "/usr/lib/postgresql/15/bin"
PG_PORT = "54333"
GOLDEN = Path(__file__).parent / "golden" / "postgres_full_sync.sql"

SEED = """
CREATE TABLE "customer" (
    "id" INTEGER PRIMARY KEY,
    "name" TEXT,
    "created_at" DATE
);
CREATE TABLE "order" (
    "id" INTEGER PRIMARY KEY,
    "customer_id" INTEGER REFERENCES "customer"("id"),
    "select" TEXT,
    "total" DOUBLE PRECISION
);
CREATE TABLE "order_line" (
    "id" INTEGER PRIMARY KEY,
    "order_id" INTEGER REFERENCES "order"("id"),
    "qty" INTEGER
);
INSERT INTO "customer" VALUES (3, 'Old Corp', DATE '2020-05-05'),
                              (9, 'Doomed Inc', DATE '2019-01-01');
INSERT INTO "order" VALUES (42, 9, 'x', 1.0), (43, 9, 'y', 2.0),
                           (55, 3, 'old', 5.0);
INSERT INTO "order_line" VALUES (900, 42, 7);
"""


def _as_postgres(cmd: list[str]) -> subprocess.CompletedProcess:
    """postgres refuses to run as root; under root, hop through the
    packaging-created postgres user (the data dir is chowned to it),
    otherwise run directly as the current user."""
    if os.geteuid() == 0:
        quoted = " ".join(shlex.quote(c) for c in cmd)
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c", quoted],
            capture_output=True,
            text=True,
        )
    return subprocess.run(cmd, capture_output=True, text=True)


@pytest.fixture(scope="module")
def pg_sock():
    """A throwaway single-tenant cluster: unix socket only (no TCP —
    nothing to collide with), trust auth, torn down with its data
    dir. Yields the socket directory psql connects to."""
    if not os.path.exists(f"{PG_BIN}/initdb"):
        pytest.skip("PostgreSQL binaries not installed")
    tmp = tempfile.mkdtemp(prefix="pg_live_")
    os.chmod(tmp, 0o777)
    data = os.path.join(tmp, "data")
    if os.geteuid() == 0:
        subprocess.run(["chown", "postgres:postgres", tmp], check=True)
    try:
        init = _as_postgres(
            [f"{PG_BIN}/initdb", "-D", data, "-A", "trust", "-U", "postgres"]
        )
        if init.returncode != 0:
            pytest.skip(f"initdb failed: {init.stderr[-200:]}")
        start = _as_postgres(
            [
                f"{PG_BIN}/pg_ctl",
                "-D",
                data,
                "-l",
                os.path.join(tmp, "log"),
                "-o",
                f"-k {tmp} -p {PG_PORT} -c listen_addresses=''",
                "start",
            ]
        )
        if start.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {start.stderr[-200:]}")
        yield tmp
    finally:
        _as_postgres(
            [f"{PG_BIN}/pg_ctl", "-D", data, "-m", "immediate", "stop"]
        )
        shutil.rmtree(tmp, ignore_errors=True)


def _psql(sock: str, db: str, *args: str, check: bool = True):
    p = subprocess.run(
        [
            "psql",
            "-X",
            "-h",
            sock,
            "-p",
            PG_PORT,
            "-U",
            "postgres",
            "-d",
            db,
            "-v",
            "ON_ERROR_STOP=1",
            "-t",
            "-A",
            *args,
        ],
        capture_output=True,
        text=True,
    )
    if check:
        assert p.returncode == 0, p.stderr
    return p


def _fresh_db(sock: str, name: str) -> str:
    _psql(sock, "postgres", "-c", f'DROP DATABASE IF EXISTS "{name}"')
    _psql(sock, "postgres", "-c", f'CREATE DATABASE "{name}"')
    _psql(sock, name, "-c", SEED)
    return name


def _rows(sock: str, db: str, sql: str) -> list[str]:
    return [
        line
        for line in _psql(sock, db, "-c", sql).stdout.splitlines()
        if line
    ]


def test_golden_script_executes_verbatim_with_fk_enforcement(pg_sock):
    """The pinned golden BYTES run unmodified; the final state is the
    main_test.go-style assert: deletes applied child->parent under
    real FK constraints, upserts parent->child, immutable column
    untouched, staging gone."""
    db = _fresh_db(pg_sock, "sync_verbatim")
    run = _psql(pg_sock, db, "-f", str(GOLDEN))
    assert run.returncode == 0, run.stderr
    assert _rows(
        pg_sock, db,
        'SELECT "id", "name", "created_at"::text FROM "customer" ORDER BY "id"',
    ) == [
        "3|Renamed Corp|2020-05-05",  # renamed; created_at IMMUTABLE
        "7|O'Hara \\ Sons|2026-08-14",  # inserted (quote + backslash intact)
    ]
    assert _rows(
        pg_sock, db,
        'SELECT "id", "customer_id", "select", "total" FROM "order" ORDER BY "id"',
    ) == [
        "55|3|standard|99",  # updated
        "101|7|expedited|12.5",  # inserted, FK to the new customer
    ]
    assert _rows(
        pg_sock, db,
        'SELECT "id", "order_id", "qty" FROM "order_line" ORDER BY "id"',
    ) == [
        "1001|101|3",
        "1002|101|1",
    ]
    # staging dropped
    assert _rows(
        pg_sock, db,
        "SELECT tablename FROM pg_tables WHERE tablename LIKE 'stg_%'",
    ) == []


def test_poisoned_apply_rolls_back_everything(pg_sock):
    """All-or-nothing on a real engine: one in-transaction statement
    rewritten to reference a missing column aborts the run, and every
    target table reads back EXACTLY pre-sync — no partial deletes, no
    partial upserts (the reference's single-transaction contract,
    SURVEY §4.1)."""
    db = _fresh_db(pg_sock, "sync_poison")
    poisoned = []
    for line in GOLDEN.read_text().splitlines():
        if line.startswith('UPDATE "order" '):
            line = line.replace('s."total"', 's."no_such_column"')
        poisoned.append(line)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".sql", delete=False
    ) as f:
        f.write("\n".join(poisoned))
        path = f.name
    try:
        run = _psql(pg_sock, db, "-f", path, check=False)
        assert run.returncode != 0
        assert "no_such_column" in run.stderr
    finally:
        os.unlink(path)
    # targets untouched — including the deletes that ran BEFORE the
    # poisoned statement inside the same transaction
    assert _rows(
        pg_sock, db, 'SELECT "id" FROM "customer" ORDER BY "id"'
    ) == ["3", "9"]
    assert _rows(
        pg_sock, db, 'SELECT "id" FROM "order" ORDER BY "id"'
    ) == ["42", "43", "55"]
    assert _rows(
        pg_sock, db, 'SELECT "id" FROM "order_line" ORDER BY "id"'
    ) == ["900"]
    assert _rows(
        pg_sock, db, 'SELECT "name" FROM "customer" WHERE "id" = 3'
    ) == ["Old Corp"]


def test_wrong_delete_order_would_fail_under_fk(pg_sock):
    """The control experiment: parent-before-child deletes REJECTED
    by the same schema — proving the FK constraints are live and the
    golden order is what made the verbatim run pass (not a toothless
    schema)."""
    db = _fresh_db(pg_sock, "sync_fkcheck")
    bad = _psql(
        pg_sock,
        db,
        "-c",
        'DELETE FROM "customer" WHERE "id" = 9',
        check=False,
    )
    assert bad.returncode != 0
    assert "violates foreign key" in bad.stderr
