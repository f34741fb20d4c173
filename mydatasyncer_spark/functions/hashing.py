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


# Universal-hash permutation family over one base hash: computing one
# md5 per input and k cheap integer permutations is ~k× less hashing
# than k seeded md5s — the difference between 34s and ~4s for the
# MinHash signature build at sf0.1. Constants are derived from a
# fixed formula so the DuckDB oracle inlines identical literals.
UHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)


def _uhash_constants(seed: int) -> tuple[int, int]:
    a = ((2 * seed + 1) * 2_654_435_761) % UHASH_PRIME
    b = (seed * 40_503 + 1) % UHASH_PRIME
    return a, b


def permuted_hash(base: Column, seed: int) -> Column:
    """``(a · (base mod p) + b) mod p`` — exact in int64 (a < 2^31,
    base mod p < 2^31 ⇒ product < 2^62)."""
    a, b = _uhash_constants(seed)
    return (F.lit(a) * (base % F.lit(UHASH_PRIME)) + F.lit(b)) % F.lit(UHASH_PRIME)


def permuted_hash_sql(base_expr: str, seed: int) -> str:
    a, b = _uhash_constants(seed)
    return f"(({a} * (({base_expr}) % {UHASH_PRIME}) + {b}) % {UHASH_PRIME})"
