"""Mergeable distinct-count rollups (DataSketches HLL).

The warehouse pattern ``COUNT(DISTINCT user)`` cannot pre-aggregate:
distinct counts don't add. Sketches do — store one HLL partial per
fine-grained cell (day × dimension), and ANY coarser rollup (month,
all-time, other dimension subsets) is a sketch union over the tiny
state table, never a re-scan of the fact. Spark's built-in
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
(Apache DataSketches) make the whole path JVM-native and the partials
are the standard cross-system serialization format.

Determinism note: estimates are deterministic for fixed input (the
sketch is order-insensitive), but NOT reproducible by a different
engine — contract queries therefore verify the error bound against
exact counts (the ``sketch_error_bounds`` pattern). Union-of-partials
tracks the direct sketch tightly but not bit-identically (DataSketches
unions may switch internal representation); the pinned contract is
<2% relative agreement plus the exact-count error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "sketch"


def sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL partials: (group_cols..., sketch BINARY, n_rows).
    Store at the finest grouping you'll ever roll up from; one scan of
    the fact, map-side combined."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias(SKETCH_COL),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


def sketch_rollup_merge(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Roll partials up to a coarser grouping by sketch union — state
    table in, state table out; the fact is never touched."""
    return partials.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(SKETCH_COL)).alias(SKETCH_COL),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def sketch_estimate(partials: DataFrame) -> DataFrame:
    """Surface each row's sketch as an approximate distinct count."""
    return partials.withColumn(
        "approx_distinct",
        F.hll_sketch_estimate(F.col(SKETCH_COL)).cast("bigint"),
    ).drop(SKETCH_COL)
