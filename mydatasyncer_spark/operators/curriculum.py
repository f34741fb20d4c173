"""Curriculum tier assignment that survives 100 TB.

The exact formulation (``percent_rank`` over a per-source window,
``__spark_entry__.curriculum_quality_tiers``) is the right *contract*
— but a window partition is one task, and a curriculum typically has
a handful of sources, so at scale each task would sort its source's
entire corpus: the canonical single-reducer scale-killer.

The scalable path decomposes into bounded pieces:

1. ``groupBy(source, quality).count()`` — a map-side-combinable
   aggregate. Boundedness is the CALLER's contract: pass a rounded
   quality (the gate query rounds to 6 dp in [0, 1]), so the result
   is bounded by ``|sources| x 1e6 + 1`` rows regardless of corpus
   size — this function groups by the raw value it is given and
   cannot bound a continuous score by itself.
2. A running-sum window over that *pre-aggregated* table gives, per
   (source, quality), the number of docs strictly below — the
   per-source sort is over distinct quality values, never documents.
3. Tier cut points per source: the smallest quality whose
   strictly-below count crosses each tier fraction. Compared in
   integer arithmetic (``3*below >= k*n``) so no float-ratio rounding
   can diverge across engines.
4. Docs get tiers via a broadcast join on source (one row per source)
   and two range comparisons — a narrow map-side pass over the
   corpus; no document-level shuffle anywhere after step 1's partial
   aggregation.

Ties share a tier by construction (tiers are a function of the
quality value), which is what a curriculum wants: the exact-rank
form's doc_id tiebreak can split identical-quality docs across tiers.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quality_tier_cutpoints(
    df: DataFrame,
    source_col: str = "source",
    quality_col: str = "quality",
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """One row per source with ``cut1..cutK`` columns: ``cut_k`` is the
    smallest quality value whose strictly-below doc fraction reaches
    ``fractions[k-1]`` (NULL when no value does — e.g. a single-valued
    source, where every doc stays below the first cut).

    Fractions must be rationals with small denominators (defaults:
    thirds); the crossing test runs as exact integer arithmetic.
    """
    g = df.groupBy(source_col, quality_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(source_col).orderBy(quality_col)
    below = (
        F.sum("_c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("_c")
    )
    n = F.sum("_c").over(
        Window.partitionBy(source_col).rangeBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = g.select(
        source_col, quality_col, below.alias("_below"), n.alias("_n")
    )
    cuts = []
    for i, frac in enumerate(fractions, start=1):
        # frac as num/den in integers: below/n >= num/den  <=>
        # den*below >= num*n  (exact; fractions are small rationals)
        r = Fraction(frac).limit_denominator(1000)
        crossed = F.col("_below") * F.lit(r.denominator) >= F.col(
            "_n"
        ) * F.lit(r.numerator)
        cuts.append(
            F.min(F.when(crossed, F.col(quality_col))).alias(f"cut{i}")
        )
    return ranked.groupBy(source_col).agg(*cuts)


def assign_quality_tiers(
    df: DataFrame,
    cutpoints: DataFrame,
    source_col: str = "source",
    quality_col: str = "quality",
    labels: tuple[str, ...] = ("low", "mid", "high"),
) -> DataFrame:
    """Attach a ``tier`` column by broadcast-joining the per-source
    cut points (one row per source) and comparing quality against
    them highest-first. NULL cuts (nothing crossed that fraction)
    compare false and fall through to the lower tier.

    The join is null-safe and LEFT (r13, the ``apply_mix_weights``
    discipline): a NULL source is a regular group everywhere else in
    the family, so its docs must match their own cut row rather than
    silently vanish on a plain equality join — and a source absent
    from ``cutpoints`` entirely (tiers computed on an earlier corpus)
    keeps its docs, falling through to the lowest tier via the same
    NULL-cuts-compare-false rule."""
    cuts = F.broadcast(
        cutpoints.withColumnRenamed(source_col, "_cut_src")
    )
    out = df.join(
        cuts, F.col(source_col).eqNullSafe(F.col("_cut_src")), "left"
    ).drop("_cut_src")
    chain = None
    for i in range(len(labels) - 1, 0, -1):
        cond = F.col(quality_col) >= F.col(f"cut{i}")
        chain = (
            F.when(cond, F.lit(labels[i]))
            if chain is None
            else chain.when(cond, F.lit(labels[i]))
        )
    tier = chain.otherwise(F.lit(labels[0]))
    return out.select(*df.columns, tier.alias("tier"))
