"""Interval-overlap join without the pair-space blow-up.

Spark plans a raw ``a.start <= b.end AND b.start <= a.end`` join as a
BroadcastNestedLoopJoin (or a cartesian product) — quadratic and
undistributable. The standard fix, hand-rolled here because vanilla
Spark has no range-join optimization: chunk time into fixed buckets,
explode each interval onto the buckets it covers, equi-join on
``(keys..., bucket)``, then apply the exact overlap predicate as a
residual. An overlapping pair shares at least one bucket, so recall
is exact; a pair sharing SEVERAL buckets would duplicate, so only the
first shared bucket — ``max(floor(start_a/B), floor(start_b/B))``,
which both sides can compute — emits it: exactly-once without a
distinct shuffle.

Scale notes: fan-out per interval is ``len/B + 1`` rows of (keys,
bucket, bounds) — pick ``bucket_seconds`` near the typical interval
length so fan-out is O(1). Long-tail intervals are the skew to
watch: a single ``sequence(first, last)`` for a 1000x-length outlier
materializes the whole bucket array in one row (driver-of-task memory
spike) before the join shuffle can spread it. The guard is two-level:
intervals spanning more than ``max_buckets_per_row`` buckets first
explode into SEGMENTS of at most that many buckets (a lazily-piped
generator row per segment, each carrying the ORIGINAL bounds), and
each segment then explodes into its own buckets — so no single row
ever materializes more than ``max_buckets_per_row`` array elements,
and the equi-join shuffle redistributes the outlier's rows across the
cluster like any other rows. Exactly-once is preserved because both
the residual predicate and the first-shared-bucket emission rule use
the carried ORIGINAL starts, which segmentation does not change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segmented_buckets(
    df: DataFrame,
    start: str,
    end: str,
    bucket_seconds: int,
    max_buckets_per_row: int,
) -> DataFrame:
    """``df`` with a ``_bucket`` column, one output row per bucket the
    [start, end] interval covers — produced via an intermediate
    segment explode so no single row holds more than
    ``max_buckets_per_row`` sequence elements. All input columns are
    carried through unchanged (original bounds included)."""
    b = F.lit(float(bucket_seconds))
    m = int(max_buckets_per_row)
    if m < 1:
        raise ValueError("max_buckets_per_row must be >= 1")
    first = F.floor(F.col(start) / b).cast("long")
    last = F.floor(F.col(end) / b).cast("long")
    seg = df.select(
        "*",
        first.alias("_first_b"),
        last.alias("_last_b"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((last - first) / F.lit(m)).cast("long"),
            )
        ).alias("_seg"),
    )
    seg_first = F.col("_first_b") + F.col("_seg") * F.lit(m)
    seg_last = F.least(seg_first + F.lit(m - 1), F.col("_last_b"))
    return seg.select(
        *df.columns, F.explode(F.sequence(seg_first, seg_last)).alias("_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how_overlap: str = "closed",
    max_buckets_per_row: int = 256,
) -> DataFrame:
    """All (left row, right row) pairs whose intervals overlap,
    optionally restricted to equal values on the ``on`` key columns.
    ``how_overlap`` picks the bound convention:

    - ``"closed"``: [start, end] — touching endpoints DO overlap;
    - ``"half_open"``: [start, end) — the event-window convention:
      an interval ending exactly where another starts does NOT
      overlap it, and zero-length intervals match nothing.

    Only the residual predicate differs: the bucket cover (computed
    for closed bounds) is a superset of the half-open cover, so
    recall stays exact, and the first-shared-bucket emission rule
    uses only the starts, which both conventions cover. Start/end
    columns must be numeric seconds (use ``contract.ts_epoch``).
    Output: all left columns + all right columns (names must not
    collide except the ``on`` keys, which appear once).

    ``max_buckets_per_row`` bounds the per-row explode for long-tail
    intervals (see module docstring); results are independent of its
    value. The segment-index sequence itself holds span/m elements,
    so for a worst-case span S pick ``m ~ sqrt(S)`` to bound BOTH
    explode levels at ~sqrt(S) array elements per row.
    """
    if how_overlap not in ("closed", "half_open"):
        raise ValueError(
            "how_overlap must be 'closed' or 'half_open', got "
            f"{how_overlap!r}"
        )
    on = on or []
    lb = segmented_buckets(
        left, left_start, left_end, bucket_seconds, max_buckets_per_row
    )
    rb = segmented_buckets(
        right, right_start, right_end, bucket_seconds, max_buckets_per_row
    )
    joined = lb.join(rb, on=[*on, "_bucket"])
    if how_overlap == "closed":
        overlap = (F.col(left_start) <= F.col(right_end)) & (
            F.col(right_start) <= F.col(left_end)
        )
    else:  # half_open: [start, end)
        overlap = (F.col(left_start) < F.col(right_end)) & (
            F.col(right_start) < F.col(left_end)
        )
    first_shared = F.greatest(
        F.floor(F.col(left_start) / F.lit(float(bucket_seconds))).cast(
            "long"
        ),
        F.floor(F.col(right_start) / F.lit(float(bucket_seconds))).cast(
            "long"
        ),
    )
    return (
        joined.filter(overlap)
        .filter(F.col("_bucket") == first_shared)
        .drop("_bucket")
    )
