"""Driver-environment replica: run every contract query on a VANILLA
SparkSession and hash-compare against the DuckDB oracle.

The driver's correctness harness builds its own ``SparkSession`` with
*no* engine configuration, so any contract query that silently depends
on conf applied in :func:`mydatasyncer_spark.session.get_spark`
(e.g. ``spark.sql.legacy.parquet.nanosAsLong`` for the events fixture)
passes the local suite but errors in the driver gate. Round 1 lost six
queries exactly this way.

This script is the regression guard: it is invoked in a **subprocess**
by ``test_vanilla_session.py`` (a vanilla session can't be created
inside the pytest process — a second ``getOrCreate()`` shares the
build-time conf of the first), builds the same kind of bare session the
driver uses, and runs the full oracle parity sweep.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from test_oracle_parity import compare, duck_connection

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

    # Deliberately NO engine conf — this must mirror the driver harness.
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("vanilla-gate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures: list[str] = []
    con = duck_connection(sf_dir)
    try:
        for name in sorted(queries):
            try:
                spark_pdf = queries[name](spark, sf_dir).toPandas()
                oracle = oracles.get(name)
                if oracle is None:
                    assert len(spark_pdf) >= 0
                else:
                    oracle_pdf = con.execute(oracle).fetchdf()
                    compare(name, spark_pdf, oracle_pdf)
                print(f"PASS {name}", flush=True)
            except Exception:
                failures.append(name)
                print(f"FAIL {name}\n{traceback.format_exc()}", flush=True)
    finally:
        con.close()
        spark.stop()

    if failures:
        print(f"vanilla gate: {len(failures)} failed: {failures}", flush=True)
        return 1
    print(f"vanilla gate: all {len(queries)} queries green", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
