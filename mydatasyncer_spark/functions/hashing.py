"""Cross-engine deterministic hashing primitives.

Engine-native hash functions differ between Spark (xxhash64,
murmur3) and DuckDB (its own 64-bit hash), so any operator whose
*oracle* must reproduce hash values bit-for-bit routes through md5 —
identical everywhere — parsed to a 48-bit integer:

Spark:   ``conv(substr(md5(x), 1, 12), 16, 10)::long``
DuckDB:  ``('0x' || substr(md5(x), 1, 12))::BIGINT``

48 bits keeps the value far from BIGINT overflow while leaving a
~2.8e14 keyspace — collision probability for billions of distinct
inputs stays per-pair negligible (for exact-dedup keys we use the
full md5 string instead).

For purely internal hashing (diff fingerprints, salting) prefer the
native ``xxhash64`` — it is faster and never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 12  # 48 bits


def hash48(col: Column) -> Column:
    """Deterministic 48-bit hash of a string column (JVM-side only)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, HEX_DIGITS), 16, 10).cast(
        "long"
    )


def hash48_sql(expr: str) -> str:
    """DuckDB SQL producing the identical value as :func:`hash48`."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {HEX_DIGITS}))::BIGINT)"


def seeded_hash48(col: Column, seed: int) -> Column:
    """Family of independent hash functions via seed suffixing —
    the MinHash permutation family."""
    return hash48(F.concat(col.cast("string"), F.lit(f"#{seed}")))


def seeded_hash48_sql(expr: str, seed: int) -> str:
    return hash48_sql(f"CAST({expr} AS VARCHAR) || '#{seed}'")
