"""Shared helpers for the driver contract (`__spark_entry__.py`).

Cross-engine determinism rules used by every query/oracle pair:

- **Money math in exact decimals, surfaced as doubles.** ``SUM`` over
  doubles is order-dependent; both Spark and DuckDB sum DECIMALs
  exactly, and casting the identical exact decimal to double is the
  same IEEE value in both engines. So aggregates are computed as
  ``CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)`` on both sides.
- **Counts as BIGINT** (DuckDB ``SUM(int)`` widens to HUGEINT — always
  cast).
- **Stable snapshot derivations.** The diff-parity queries derive the
  file/db snapshot pair from ``orders`` with pure modular-arithmetic
  mutations so the SQL oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Older fixture generations wrote ts as TIMESTAMP(NANOS),
        # which vanilla Spark refuses to read (PARQUET_TYPE_ILLEGAL).
        # The legacy nanosAsLong conf is runtime-settable, so force it
        # here — callers may hand us a session built without engine
        # conf (e.g. the driver's harness). Idempotent; a no-op for
        # the current timestamp[us] fixtures.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Current fixtures store ts as naive timestamp[us] → Spark
        # reads TIMESTAMP_NTZ (kept as-is; wall time IS the UTC
        # instant — use ts_epoch() for arithmetic). Legacy nanos
        # fixtures read as long under nanosAsLong — surface those as
        # a real timestamp at micros precision.
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer `div`, not float division: epoch-nanos exceed
            # 2^53 so a double round-trip would corrupt low digits;
            # truncation matches DuckDB's ns->us cast semantics
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ts_epoch(col):
    """Seconds since epoch as DOUBLE, timezone-independent.

    Works for both TIMESTAMP and TIMESTAMP_NTZ inputs. The fixtures'
    naive micros wall time IS the UTC instant, and
    ``to_utc_timestamp(ts, 'UTC')`` pins that wall time to UTC without
    consulting the session timezone, so the result matches DuckDB's
    ``epoch(ts)`` under any driver session configuration. (A bare
    ``CAST(ts AS DOUBLE)`` is illegal on TIMESTAMP_NTZ and
    session-timezone-dependent after an NTZ→LTZ cast — never do that.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(F.to_utc_timestamp(c, "UTC")) / F.lit(1000000.0)


def dec(col, precision: int = 12, scale: int = 2):
    """Exact-decimal view of a money column."""
    return F.col(col).cast(f"decimal({precision},{scale})") if isinstance(col, str) else col.cast(f"decimal({precision},{scale})")


def dsum(col, alias: str):
    """Exact decimal sum surfaced as double (see module docstring)."""
    return F.sum(dec(col)).cast("double").alias(alias)


# --- snapshot pair used by the diff-parity queries ------------------
# db side   = orders with keys % 10 != 5
# file side = orders with keys % 10 != 3, price +10.00 where key % 7 == 0
# => inserts are %10==5 keys, deletes are %10==3 keys, updates %7==0.


def snapshot_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 != 5)


def snapshot_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 != 3)
    return o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(10.0)
        ).otherwise(F.col("o_totalprice")),
    )


SNAPSHOT_SQL = """
db_side AS (
    SELECT * FROM orders WHERE o_orderkey % 10 <> 5
),
file_side AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 <> 3
)
"""


# --- localized snapshot pair (the daily-sync shape) -----------------
# Changes confined to 3 of 64 key-RANGE buckets, bucket(k) =
# (k div 512) % 64: updates in bucket 3, deletes in bucket 7 (file
# drops them), inserts in bucket 11 (db lacks them). The snapshots
# amplify orders 8× with derived keys (k*8+i, still unique) so the
# wide diff is genuinely shuffle-bound at sf0.1 — at 150 k rows the
# joins cost less than one Spark job barrier and no pruning strategy
# is measurable. Modular arithmetic keeps the whole pair (and the 8×
# amplification, a cross join with range(8)) DuckDB-reproducible.
# 8× (not less): at 4× the full diff is ~3 s and the pruning
# pre-pass overhead (~2 extra job barriers) eats the win; at 8× the
# wide shuffles dominate and pruned runs ~2× faster — the regime the
# operator exists for.

_RANGE_BUCKET = "pmod(o_pk div 512, 64)"


def localized_bucket(df: DataFrame) -> Column:
    return F.expr(_RANGE_BUCKET)


def _orders_amplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rep = o.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(7))))
    return rep.select(
        (F.col("o_orderkey") * 8 + F.col("_r")).alias("o_pk"),
        *[c for c in o.columns if c != "o_orderkey"],
    )


def snapshot_db_localized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders_amplified(spark, sf_dir).filter(
        F.expr(f"{_RANGE_BUCKET} <> 11")
    )


def snapshot_file_localized(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders_amplified(spark, sf_dir).filter(
        F.expr(f"{_RANGE_BUCKET} <> 7")
    )
    return o.withColumn(
        "o_totalprice",
        F.when(
            F.expr(f"{_RANGE_BUCKET} = 3"), F.col("o_totalprice") + F.lit(10.0)
        ).otherwise(F.col("o_totalprice")),
    )


SNAPSHOT_LOCALIZED_SQL = """
amplified AS (
    SELECT o.o_orderkey * 8 + r.i AS o_pk,
           o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders o CROSS JOIN (SELECT unnest(range(0, 8)) AS i) r
),
db_side AS (
    SELECT * FROM amplified WHERE ((o_pk // 512) % 64) <> 11
),
file_side AS (
    SELECT o_pk, o_custkey, o_orderstatus,
           CASE WHEN ((o_pk // 512) % 64) = 3 THEN o_totalprice + 10.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM amplified WHERE ((o_pk // 512) % 64) <> 7
)
"""
