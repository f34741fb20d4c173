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


# ---------------------------------------------------------- KLL quantiles
# Same state-table pattern for QUANTILES: percentile() cannot
# pre-aggregate either, but KLL sketches merge. Store one partial per
# finest cell; any coarser rollup (and any quantile of it) reads only
# the partials. Spark's kll_*_double family is DataSketches KLL —
# k=200 gives ~1.65% normalized RANK error at 99% confidence, so the
# contract checks the estimate's exact rank, not its value.

KLL_COL = "kll"


def quantile_sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-group KLL partials over a double column:
    (group_cols..., kll BINARY, n_rows). One fact scan, map-side
    combined; NULL values are skipped by the sketch (n_rows counts
    all rows — track non-null separately if the gap matters)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias(KLL_COL),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


def quantile_sketch_merge(
    partials: DataFrame, group_cols: list[str], k: int = 200
) -> DataFrame:
    """Roll KLL partials up to a coarser grouping by sketch merge —
    the fact is never touched."""
    return partials.groupBy(*group_cols).agg(
        F.kll_merge_agg_double(F.col(KLL_COL), F.lit(k)).alias(KLL_COL),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def quantile_estimate(
    partials: DataFrame, quantiles: tuple[float, ...] = (0.5,)
) -> DataFrame:
    """Surface each row's sketch as approximate quantile columns
    (``q_50`` for 0.5, ``q_90`` for 0.9, ...)."""
    out = partials
    for q in quantiles:
        out = out.withColumn(
            f"q_{int(round(q * 100))}",
            F.kll_sketch_get_quantile_double(F.col(KLL_COL), F.lit(float(q))),
        )
    return out.drop(KLL_COL)


# ------------------------------------------------------------ theta sets
# Theta sketches are the mergeable-distinct structure that ALSO
# supports set algebra: union, intersection, difference — the
# "audience overlap" questions HLL cannot answer (how many users did
# BOTH X and Y) without re-scanning the fact per pair.


THETA_COL = "theta"


def theta_rollup(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lg_nom_entries: int = 12,
) -> DataFrame:
    """Per-group theta partials: (group_cols..., theta BINARY,
    n_rows). Exact below 2^lg_nom_entries retained keys, ~1/sqrt(2^lg)
    relative error above."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(key_col), F.lit(lg_nom_entries)).alias(
            THETA_COL
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


def theta_union_rollup(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Coarser rollup by sketch union over the state table."""
    return partials.groupBy(*group_cols).agg(
        F.expr(f"theta_union_agg({THETA_COL})").alias(THETA_COL),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def theta_pairwise_overlap(
    partials: DataFrame, entity_col: str
) -> DataFrame:
    """Pairwise audience overlap between every two entities from
    their stored partials alone: |A ∩ B| = |A| + |B| − |A ∪ B| via
    the scalar two-sketch ``theta_union`` (inclusion–exclusion keeps
    it one self-join over the TINY partials table — per-pair work is
    sketch-sized, never fact-sized). Output: entity_a < entity_b,
    approx distinct of each side, their union, and the intersection.

    Plan note: the ``<`` pairing condition makes this a nested-loop
    join BY DESIGN — the input is the partials table (one row per
    entity, entities are few), so the |E|² pair space is the output
    itself, not a blow-up. Never feed this a fact table."""
    a = partials.select(
        F.col(entity_col).alias("entity_a"),
        F.col(THETA_COL).alias("_sk_a"),
    )
    b = partials.select(
        F.col(entity_col).alias("entity_b"),
        F.col(THETA_COL).alias("_sk_b"),
    )
    pairs = a.join(b, F.col("entity_a") < F.col("entity_b"))
    est = lambda c: F.theta_sketch_estimate(c).cast("double")
    union_est = est(F.expr("theta_union(_sk_a, _sk_b)"))
    return pairs.select(
        "entity_a",
        "entity_b",
        est(F.col("_sk_a")).alias("approx_a"),
        est(F.col("_sk_b")).alias("approx_b"),
        union_est.alias("approx_union"),
        (
            est(F.col("_sk_a")) + est(F.col("_sk_b")) - union_est
        ).alias("approx_overlap"),
    )
