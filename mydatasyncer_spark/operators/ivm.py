"""Incremental view maintenance for additive rollups.

A 100 TB fact table with a maintained daily/group rollup should not
re-aggregate the world after a sync that touched 0.1% of rows. For
additive aggregates (SUM, COUNT — and means derivable from them), the
diff triple IS the delta stream:

- insert  → +value, +1 row to its group
- delete  → -value, -1 row from its group
- update  → two deltas: -(before value) from the BEFORE group and
  +(after value) to the AFTER group — so rows that *move between
  groups* (a group-key column changed) maintain both sides correctly.

``new_state = state ⟗ group_deltas`` is one shuffle over the DELTA
(diff-sized, not fact-sized) plus a join against the state table —
the fact table is never re-scanned. Groups whose row count reaches
zero are dropped, groups first seen in the delta are created.

Exactness: values are summed as DECIMAL (same contract as the rest of
the engine — see contract.py's money-math rule), so maintained state
is bit-identical to a full recompute, which is exactly what the
``incremental_rollup`` contract query's oracle checks. That includes
SQL NULL-sum semantics: the state tracks the count of NON-NULL values
(``n_vals``) so a group holding only NULL values yields ``sum_val``
NULL — exactly what ``SUM`` over that group recomputes — instead of
the 0 a bare coalesce would fabricate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.diff import BEFORE_COL, DiffResult

_SUM = "sum_val"
_CNT = "n_rows"
_NNV = "n_vals"


def rollup_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    precision: int = 18,
    scale: int = 2,
) -> DataFrame:
    """The full-recompute form of the maintained state:
    (group_cols..., sum_val DECIMAL, n_rows BIGINT, n_vals BIGINT).
    Run once to bootstrap; afterwards :func:`maintain_rollup` keeps it
    fresh from diffs."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(value_col).cast(f"decimal({precision},{scale})")).alias(
            _SUM
        ),
        F.count(F.lit(1)).alias(_CNT),
        F.count(F.col(value_col)).alias(_NNV),
    )


def maintain_rollup(
    state_df: DataFrame,
    diff: DiffResult,
    group_cols: list[str],
    value_col: str,
    precision: int = 18,
    scale: int = 2,
) -> DataFrame:
    """Apply a diff's deltas to a rollup state (see module docstring).

    ``state_df`` must have the :func:`rollup_state` schema. Returns
    the new state with the same schema; groups with zero remaining
    rows are dropped. Cost: one aggregation + one full-outer join,
    both sized by the DIFF, never by the fact table.
    """
    dec = f"decimal({precision},{scale})"

    def leg(df: DataFrame, sign: int, cols_from=None) -> DataFrame:
        src = cols_from or {c: F.col(c) for c in [*group_cols, value_col]}
        return df.select(
            *[src[c].alias(c) for c in group_cols],
            (F.lit(sign) * src[value_col].cast(dec)).alias("_dv"),
            F.lit(sign).cast("bigint").alias("_dn"),
            F.when(src[value_col].isNull(), F.lit(0))
            .otherwise(F.lit(sign))
            .cast("bigint")
            .alias("_dz"),
        )

    legs = [leg(diff.to_insert, +1), leg(diff.to_delete, -1)]
    if BEFORE_COL in diff.to_update.columns:
        before = {
            c: F.col(BEFORE_COL).getField(c)
            for c in [*group_cols, value_col]
        }
        legs.append(leg(diff.to_update, +1))          # after values
        legs.append(leg(diff.to_update, -1, before))  # before values
    deltas = legs[0]
    for l in legs[1:]:
        deltas = deltas.unionByName(l)
    grouped = deltas.groupBy(*group_cols).agg(
        F.sum("_dv").alias("_dv"),
        F.sum("_dn").alias("_dn"),
        F.sum("_dz").alias("_dz"),
    )
    # null-SAFE join keys: a plain `on=group_cols` treats NULL group
    # values as non-matching, splitting a NULL group into a stale
    # state row plus an unmerged delta row (groupBy treats NULL as a
    # regular group, the join must too)
    cond = None
    for c in group_cols:
        e = F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = e if cond is None else cond & e
    joined = state_df.alias("s").join(
        grouped.alias("d"), on=cond, how="full_outer"
    )
    zero = F.lit(0).cast(dec)
    new_nnv = (
        F.coalesce(F.col(f"s.{_NNV}"), F.lit(0))
        + F.coalesce(F.col("d._dz"), F.lit(0))
    ).cast("bigint")
    return joined.select(
        *[
            F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).alias(c)
            for c in group_cols
        ],
        # SQL SUM semantics: no non-null values left -> NULL, not 0
        F.when(
            new_nnv > 0,
            (
                F.coalesce(F.col(f"s.{_SUM}"), zero)
                + F.coalesce(F.col("d._dv"), zero)
            ).cast(dec),
        )
        .otherwise(F.lit(None).cast(dec))
        .alias(_SUM),
        (
            F.coalesce(F.col(f"s.{_CNT}"), F.lit(0))
            + F.coalesce(F.col("d._dn"), F.lit(0))
        )
        .cast("bigint")
        .alias(_CNT),
        new_nnv.alias(_NNV),
    ).filter(F.col(_CNT) > 0)
