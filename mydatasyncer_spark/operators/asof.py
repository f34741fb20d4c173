"""As-of joins (backward + forward, optional tolerance) — time-series
operators Spark has no native primitive for (beyond-parity; the
reference is pure batch snapshots, SURVEY.md §2.5 "no
theta/range/as-of joins").

Semantics: for every left row, attach the single right row with the
LARGEST right timestamp ≤ the left timestamp (backward; DuckDB/kdb
``ASOF JOIN`` with ``left.ts >= right.ts``) or the SMALLEST right
timestamp ≥ it (forward). ``tolerance_seconds`` nulls matches beyond
a horizon, as in pandas ``merge_asof``.

Implemented as a composition of built-ins — union + one window pass —
rather than a range join:

- A naive ``left.join(right, key AND r.ts <= l.ts)`` explodes to all
  qualifying pairs and re-filters (O(|matches|) per row, a shuffle of
  the blow-up).
- Here both sides are tagged and unioned, then a single
  ``last(value, ignorenulls=True)`` running window ordered by
  (ts, side) carries each right row forward to exactly the left rows
  it is as-of for. ONE shuffle (hash by key), sort within partition,
  zero pair-space blow-up, and skewed keys behave no worse than the
  window itself.

The right side must be unique per (key, ts) — pre-aggregate if not
(the contract query does) — otherwise "which same-timestamp row wins"
is undefined in every engine.

NULL semantics (r13, aligned with the SQL the oracle runs): the match
condition is an equi-join on the keys plus a timestamp comparison, so
NULL never matches — a right row with a NULL key or NULL timestamp
can match NOTHING (dropped before the union; under the old window
pass its VALUES could leak into fills while its null timestamp was
skipped, pairing a value with the wrong ``ts_out``), and a left row
with a NULL timestamp gets NO match in either direction (the forward
traversal orders ``desc_nulls_first`` so null-ts left rows precede
every right row, mirroring backward's asc-nulls-first default).
NULL-key left rows survive, null-filled — left-join semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    ts_out: str = "asof_ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of-backward join: all left columns + each right
    ``value_cols`` (null when no right row precedes) + ``ts_out`` =
    the matched right timestamp. ``tolerance_seconds`` nulls matches
    older than the horizon (pandas ``merge_asof`` tolerance)."""
    return _asof_join(
        left, right, key_cols, ts_col, value_cols, ts_out,
        direction="backward", tolerance_seconds=tolerance_seconds,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    ts_out: str = "asof_ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Forward twin: attach the right row with the SMALLEST right
    timestamp ≥ the left timestamp, per key (DuckDB ``ASOF JOIN``
    with ``left.ts <= right.ts``). Same union + one-window design —
    only the traversal order flips."""
    return _asof_join(
        left, right, key_cols, ts_col, value_cols, ts_out,
        direction="forward", tolerance_seconds=tolerance_seconds,
    )


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    ts_out: str = "asof_ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in set(key_cols) | {ts_col}
        ]
    left_cols = left.columns
    clash = set(value_cols) & set(left_cols)
    if clash:
        raise ValueError(
            f"right value columns {sorted(clash)} collide with left "
            "columns — rename the right side first"
        )
    if ts_out in left_cols or ts_out in value_cols:
        raise ValueError(
            f"ts_out={ts_out!r} collides with an existing column — "
            "pick a different name"
        )
    # NULL-key left rows can never equi-match, and the window pass
    # would pile every one of them into the single NULL partition —
    # the one straggler this design otherwise admits (skewed VALUES
    # spread like any window; a null-heavy key column does not).
    # Route them around the window: emitted null-padded directly,
    # exactly what the traversal would produce for them.
    null_key = F.lit(False)  # keyless (global) as-of: nothing to split
    for k in key_cols:
        null_key = null_key | F.col(k).isNull()
    padded = left.filter(null_key).select(
        *left_cols,
        F.lit(None).cast(left.schema[ts_col].dataType).alias(ts_out),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    left = left.filter(~null_key)
    l = left.withColumn(_SIDE, F.lit(1))
    for c in value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    r = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in value_cols],
    ).na.drop(subset=[*key_cols, ts_col])
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    unioned = l.unionByName(r.select(*l.columns))
    # right rows sort BEFORE left rows at an equal timestamp (side
    # asc in both traversals), so the inclusive semantics hold:
    # backward walks time ascending (>= match), forward descending
    # (<= match). NULL-ts left rows must precede every right row in
    # BOTH traversals (no comparison matches NULL): asc puts nulls
    # first already; desc needs it spelled out.
    ts_order = (
        F.col(ts_col).asc()
        if direction == "backward"
        else F.col(ts_col).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        F.last(
            F.when(F.col(_SIDE) == 0, F.col(ts_col)), ignorenulls=True
        ).over(w).alias(ts_out),
        *[
            F.last(
                F.when(F.col(_SIDE) == 0, F.col(c)), ignorenulls=True
            ).over(w).alias(f"_filled_{c}")
            for c in value_cols
        ],
    )
    in_tol = F.lit(True)
    if tolerance_seconds is not None:
        from pyspark.sql import types as T

        ts_type = filled.schema[ts_col].dataType
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            # NTZ can't cast to double; pin wall time to UTC instead
            # (timezone-independent — see contract.ts_epoch)
            def _sec(c):
                return F.unix_micros(F.to_utc_timestamp(c, "UTC")) / F.lit(1e6)

        else:

            def _sec(c):
                return c.cast("double")

        gap = F.abs(_sec(F.col(ts_col)) - _sec(F.col(ts_out)))
        in_tol = F.col(ts_out).isNotNull() & (gap <= tolerance_seconds)
    return filled.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        F.when(in_tol, F.col(ts_out)).alias(ts_out),
        *[
            F.when(in_tol, F.col(f"_filled_{c}")).alias(c)
            for c in value_cols
        ],
    ).unionByName(padded)
