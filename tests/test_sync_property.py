"""Property-based end-to-end invariant: for ANY file snapshot and ANY
prior DB state, a diff sync with delete enabled leaves the DB exactly
equal to the snapshot (the reference's defining guarantee, expressed
as one hypothesis property instead of a fixture zoo).

Values deliberately include the sharp edges: null-ish tokens,
whitespace, floats that collapse to integer form, and keys present in
one side only.
"""

from __future__ import annotations

import sqlite3

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mydatasyncer_spark.config import SyncConfig, TableSpec
from mydatasyncer_spark.sinks.applier import DbApiBackend
from mydatasyncer_spark.syncer import sync

VALUES = st.sampled_from(
    ["x", "y", "null", "", " padded ", "42", "42.0", "3.14", "true", "weird,val"]
)

ROWS = st.dictionaries(
    keys=st.integers(min_value=1, max_value=12),
    values=st.tuples(VALUES, VALUES),
    max_size=8,
)


def _csv_quote(v: str) -> str:
    if "," in v or '"' in v:
        return '"' + v.replace('"', '""') + '"'
    return v


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(file_rows=ROWS, db_rows=ROWS)
def test_diff_sync_converges_to_snapshot(spark, tmp_path_factory, file_rows, db_rows):
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, a TEXT, b TEXT)")
    conn.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(k, a, b) for k, (a, b) in db_rows.items()],
    )
    conn.commit()

    path = tmp_path_factory.mktemp("snap") / "t.csv"
    lines = ["id,a,b"] + [
        f"{k},{_csv_quote(a)},{_csv_quote(b)}" for k, (a, b) in sorted(file_rows.items())
    ]
    path.write_text("\n".join(lines) + "\n")

    cfg = SyncConfig(
        tables=[
            TableSpec(
                name="t",
                file_path=str(path),
                primary_key="id",
                sync_mode="diff",
                delete_not_in_file=True,
            )
        ]
    )
    if not file_rows:
        # empty snapshot + delete_not_in_file wipes the table (O11) —
        # covered by TestEmptyFilePolicies; the CSV would have no rows
        conn.close()
        return
    sync(spark, DbApiBackend(conn), cfg)

    got = {
        r[0]: (r[1], r[2])
        for r in conn.execute("SELECT id, a, b FROM t").fetchall()
    }
    conn.close()
    # DB state must equal the snapshot in CANONICAL space: the sync
    # writes the file-side representation for inserted/updated rows,
    # and rows that only differ canonically (e.g. "42" vs "42.0")
    # legitimately keep the DB representation
    from mydatasyncer_spark.functions.canonical import canonical_str
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def canon(pairs):
        df = spark.createDataFrame(
            [(k, a, b) for k, (a, b) in sorted(pairs.items())],
            "id long, a string, b string",
        )
        return {
            r["id"]: (r["ca"], r["cb"])
            for r in df.select(
                "id",
                canonical_str(F.col("a"), T.StringType()).alias("ca"),
                canonical_str(F.col("b"), T.StringType()).alias("cb"),
            ).collect()
        }

    assert set(got) == set(file_rows), "key sets must match the snapshot"
    assert canon(got) == canon(file_rows)
