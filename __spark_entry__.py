"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
beyond-parity operator from §7/M4), implemented through
``mydatasyncer_spark`` and paired with a DuckDB-equivalent oracle in
``oracle_sql()``. Cross-engine determinism rules (exact-decimal money
math surfaced as doubles, BIGINT counts) live in
``mydatasyncer_spark/contract.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mydatasyncer_spark.contract import (
    SNAPSHOT_SQL,
    dsum,
    snapshot_db,
    snapshot_file,
    table,
)
from mydatasyncer_spark.functions.canonical import canonical_col
from mydatasyncer_spark.operators.columns import determine_sync_columns
from mydatasyncer_spark.operators.diff import (
    detect_deletes,
    detect_inserts,
    detect_updates,
)
from mydatasyncer_spark.operators.validation import annotate_issues


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary aggregate at sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------- analytics


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Exercises: scan + pushed filter + hash aggregate with partial
    (map-side) combine — Catalyst's bread and butter. Money math in
    exact decimals (see contract.py).
    """
    l = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)")
    )
    charge = disc * (
        F.lit(1).cast("decimal(12,2)") + F.col("l_tax").cast("decimal(12,2)")
    )
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------------------- diff engine


def diff_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 insert detection: file rows whose canonical PK ∉ db."""
    return detect_inserts(
        snapshot_file(spark, sf_dir), snapshot_db(spark, sf_dir), "o_orderkey"
    )


def diff_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 update detection: PK in both, any column differs canonically."""
    f, d = snapshot_file(spark, sf_dir), snapshot_db(spark, sf_dir)
    upd = detect_updates(f, d, "o_orderkey", f.columns)
    return upd.select(
        "o_orderkey",
        F.col("_before.o_totalprice").alias("price_before"),
        F.col("o_totalprice").alias("price_after"),
    )


def diff_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 delete detection: db rows whose canonical PK ∉ file."""
    return detect_deletes(
        snapshot_file(spark, sf_dir), snapshot_db(spark, sf_dir), "o_orderkey"
    )


def diff_plan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 dry-run plan: the insert/update/delete counts triple."""
    f, d = snapshot_file(spark, sf_dir), snapshot_db(spark, sf_dir)
    ins = detect_inserts(f, d, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n_insert")
    )
    upd = detect_updates(f, d, "o_orderkey", f.columns).agg(
        F.count(F.lit(1)).alias("n_update")
    )
    dele = detect_deletes(f, d, "o_orderkey").agg(
        F.count(F.lit(1)).alias("n_delete")
    )
    return ins.crossJoin(upd).crossJoin(dele)


# --------------------------------------------------- canonicalization (P3)


def canonical_stringify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 canonical strings: whole-float collapse, RFC3339, int casts."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        canonical_col(o, "o_totalprice").alias("canon_price"),
        canonical_col(o, "o_orderdate").alias("canon_date"),
        canonical_col(o, "o_custkey").alias("canon_custkey"),
        canonical_col(o, "o_orderstatus").alias("canon_status"),
    )


# ------------------------------------------------------- validation (V1-V4)

def _dirty_key():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.when(F.col("doc_id") % 97 == 0, F.lit(""))
        .when(F.col("doc_id") % 89 == 0, F.lit("null"))
        .when(
            F.col("doc_id") % 83 == 0,
            F.concat(F.lit(" "), F.col("doc_id").cast("string"), F.lit(" ")),
        )
        .when(F.col("doc_id") % 73 == 0, F.lit("dup"))
        .otherwise(F.col("doc_id").cast("string"))
    )

_DIRTY_KEY_SQL = """
CASE WHEN doc_id % 97 = 0 THEN ''
     WHEN doc_id % 89 = 0 THEN 'null'
     WHEN doc_id % 83 = 0 THEN ' ' || CAST(doc_id AS VARCHAR) || ' '
     WHEN doc_id % 73 = 0 THEN 'dup'
     ELSE CAST(doc_id AS VARCHAR) END
"""

_NULL_TOKENS_SQL = "('', 'null', 'nil', 'n/a', 'na', 'none', 'undefined')"


def pk_validation_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1-V4: per-reason issue histogram over a synthetically dirtied key."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", _dirty_key().alias("key")
    )
    annotated = annotate_issues(docs, "key")
    return (
        annotated.select(F.coalesce("reason", F.lit("valid")).alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def duplicate_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3/A2: duplicate-PK groups with occurrence counts (lineitem's
    natural composite-key duplication on l_orderkey)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# ------------------------------------------------- column resolution (P4)


def column_projection_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 triple intersection driving an actual pruned projection."""
    c = table(spark, sf_dir, "customer")
    cols = determine_sync_columns(
        file_cols=c.columns,
        db_cols=["c_custkey", "c_name", "c_acctbal", "c_address"],
        config_cols=[],
        primary_key="c_custkey",
    )
    return c.select(*cols)


# ------------------------------------------------------------------ registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "diff_insert": diff_insert,
        "diff_update": diff_update,
        "diff_delete": diff_delete,
        "diff_plan_counts": diff_plan_counts,
        "canonical_stringify": canonical_stringify,
        "pk_validation_histogram": pk_validation_histogram,
        "duplicate_key_detection": duplicate_key_detection,
        "column_projection_sync": column_projection_sync,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                        * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "diff_insert": f"""
            WITH {SNAPSHOT_SQL}
            SELECT f.* FROM file_side f
            WHERE NOT EXISTS (SELECT 1 FROM db_side d WHERE d.o_orderkey = f.o_orderkey)
        """,
        "diff_update": f"""
            WITH {SNAPSHOT_SQL}
            SELECT f.o_orderkey,
                   d.o_totalprice AS price_before,
                   f.o_totalprice AS price_after
            FROM file_side f JOIN db_side d USING (o_orderkey)
            WHERE f.o_totalprice <> d.o_totalprice
        """,
        "diff_delete": f"""
            WITH {SNAPSHOT_SQL}
            SELECT d.* FROM db_side d
            WHERE NOT EXISTS (SELECT 1 FROM file_side f WHERE f.o_orderkey = d.o_orderkey)
        """,
        "diff_plan_counts": f"""
            WITH {SNAPSHOT_SQL}
            SELECT
              (SELECT COUNT(*) FROM file_side f
                WHERE NOT EXISTS (SELECT 1 FROM db_side d WHERE d.o_orderkey = f.o_orderkey)) AS n_insert,
              (SELECT COUNT(*) FROM file_side f JOIN db_side d USING (o_orderkey)
                WHERE f.o_totalprice <> d.o_totalprice) AS n_update,
              (SELECT COUNT(*) FROM db_side d
                WHERE NOT EXISTS (SELECT 1 FROM file_side f WHERE f.o_orderkey = d.o_orderkey)) AS n_delete
        """,
        "canonical_stringify": """
            SELECT o_orderkey,
                   CASE WHEN o_totalprice = floor(o_totalprice)
                        THEN CAST(CAST(o_totalprice AS BIGINT) AS VARCHAR)
                        ELSE CAST(o_totalprice AS VARCHAR) END AS canon_price,
                   strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS canon_date,
                   CAST(o_custkey AS VARCHAR) AS canon_custkey,
                   o_orderstatus AS canon_status
            FROM orders
        """,
        "pk_validation_histogram": f"""
            WITH dirty AS (
                SELECT doc_id, {_DIRTY_KEY_SQL} AS key FROM documents
            ), occ AS (
                SELECT key,
                       (key IS NULL OR lower(trim(key)) IN {_NULL_TOKENS_SQL}) AS nullish,
                       row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rn
                FROM dirty
            )
            SELECT CASE WHEN nullish THEN 'null_or_empty'
                        WHEN rn > 1 THEN 'duplicate'
                        WHEN regexp_matches(key, '[\\n\\r]') THEN 'contains_line_break'
                        WHEN contains(key, chr(9)) THEN 'contains_tab'
                        WHEN length(key) > 255 THEN 'too_long'
                        WHEN trim(key) <> key THEN 'untrimmed_whitespace'
                        ELSE 'valid' END AS reason,
                   COUNT(*) AS n
            FROM occ
            GROUP BY 1
        """,
        "duplicate_key_detection": """
            SELECT l_orderkey, COUNT(*) AS n
            FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
        """,
        "column_projection_sync": """
            SELECT c_acctbal, c_custkey, c_name FROM customer
        """,
    }
