"""Local replica of the driver's correctness gate: every
``queries()`` entry runs on Spark and its ``oracle_sql()`` runs on
DuckDB over the same parquet tables; row count, column names, and
values must match exactly (order-insensitive)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from mydatasyncer_spark.contract import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            # unify the unit too: Spark yields datetime64[ns], DuckDB
            # [us], and assert_frame_equal compares raw representations
            df[col] = (
                pd.to_datetime(df[col])
                .dt.tz_localize(None)
                .astype("datetime64[ns]")
            )
        # DuckDB returns decimals as objects sometimes; unify numerics
        if df[col].dtype == object:
            sample = df[col].dropna()
            if len(sample) and all(
                type(v).__name__ == "Decimal" for v in sample.head(5)
            ):
                df[col] = df[col].astype(float)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df, oracle_df) -> None:
    s, o = normalize(spark_df), normalize(oracle_df)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch {list(s.columns)} vs {list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count {len(s)} vs {len(o)}"
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)


NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    query = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    spark_pdf = query(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    compare(name, spark_pdf, oracle_pdf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_contract_invariants():
    """EVERY queries() entry has a DuckDB oracle — since r5 even the
    sketch queries are fully hash-checkable (exact answers + error
    bound booleans); no orphan oracles."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) - set(qs) == set()
    assert set(qs) - set(oracles) == set()
