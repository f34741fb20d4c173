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
length so fan-out is O(1); the join is a plain equi hash/sort-merge
join Catalyst distributes normally, and extra equi keys (user, shard)
multiply selectivity for free. Long-tail intervals are the skew to
watch: cap them upstream or split the handful of outliers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _buckets(start_sec: Column, end_sec: Column, bucket_seconds: int) -> Column:
    b = F.lit(float(bucket_seconds))
    return F.sequence(
        F.floor(start_sec / b).cast("long"), F.floor(end_sec / b).cast("long")
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
) -> DataFrame:
    """All (left row, right row) pairs whose [start, end] intervals
    overlap (closed bounds: touching endpoints DO overlap), optionally
    restricted to equal values on the ``on`` key columns. Start/end
    columns must be numeric seconds (use ``contract.ts_epoch``).
    Output: all left columns + all right columns (names must not
    collide except the ``on`` keys, which appear once).
    """
    if how_overlap != "closed":
        raise ValueError("only closed-interval overlap is implemented")
    on = on or []
    lb = left.withColumn(
        "_bucket",
        F.explode(
            _buckets(F.col(left_start), F.col(left_end), bucket_seconds)
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            _buckets(F.col(right_start), F.col(right_end), bucket_seconds)
        ),
    )
    joined = lb.join(rb, on=[*on, "_bucket"])
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
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
