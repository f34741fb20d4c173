"""Streaming counterparts of the batch event-time operators.

The reference is strictly batch (whole-file snapshots,
SURVEY.md §2.5 notes "Streaming: None"), so these are beyond-parity
operators: the same event-time semantics as the batch
``tumbling_windows`` / ``sessionization`` queries, expressed as
Structured Streaming so a pipeline can run continuous ingestion with
late-data handling.

Scale notes: watermarks bound state; the windowed aggregate is an
incremental partial-agg (no full-history shuffle); sessionization
keeps one state row per active (user) key and times out via the
watermark, so state is O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP_SECONDS = 1800

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream (each arriving file = a micro-batch)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time windows per event type with a watermark for
    late data — the streaming twin of the batch ``tumbling_windows``
    query (same output columns)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful session assembly for one user key.

    State = (next_session_id, last_ts_epoch, open_n, open_start,
    open_last). Emits every *closed* session; the open session flushes
    on state timeout (watermark passes the gap).

    Late-data semantics (r13): a late-but-inside-the-watermark event
    can sort BEFORE rows a previous batch already folded in. It
    extends the open session's ENVELOPE — ``open_start = min``,
    ``open_last = max``, and the gap clock reads the envelope's max —
    matching the batch twin's max−min duration; it never rewinds the
    session's clock (the pre-r13 code set ``last_ts`` to the late
    event's time, shrinking the reported duration and spuriously
    splitting the next on-time event). The remaining divergence from
    the batch sessionizer is inherent to incremental state: a late
    event that global ordering would place in an earlier *closed*
    session (or that would merge two closed sessions) joins the open
    envelope instead — closed output is append-only.
    """
    (user_id,) = key
    if state.hasTimedOut:
        next_id, _, open_n, open_start, open_last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_id": [next_id - 1],
                "n_events": [open_n],
                "duration_sec": [open_last - open_start],
            }
        )
        return

    rows = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    ts = rows["ts"].map(lambda t: t.timestamp())
    if state.exists:
        next_id, last_ts, open_n, open_start, open_last = state.get
    else:
        next_id, last_ts, open_n, open_start, open_last = 1, None, 0, 0.0, 0.0

    closed: list[tuple[int, int, float]] = []
    for t in ts:
        if last_ts is None or t - last_ts > SESSION_GAP_SECONDS:
            if open_n:
                closed.append((next_id - 1, open_n, open_last - open_start))
            open_n, open_start, open_last = 0, t, t
            next_id += 1
        open_n += 1
        if t < open_start:
            open_start = t
        if t > open_last:
            open_last = t
        last_ts = open_last

    state.update((next_id, last_ts, open_n, open_start, open_last))
    # ceil, not int(): the gap test above keeps an event at EXACTLY
    # last_ts + gap in the session, so the timeout must never fire
    # before that instant — float truncation set it up to 1ms early,
    # letting a watermark landing in that sliver flush the session
    # out from under a still-in-gap boundary event (r14 sweep)
    import math

    state.setTimeoutTimestamp(
        int(math.ceil((last_ts + SESSION_GAP_SECONDS) * 1000))
    )
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_id": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "duration_sec": [c[2] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming 30-minute-gap sessionization via
    ``applyInPandasWithState`` — one state row per active user, timed
    out by event-time watermark. Batch twin: the ``sessionization``
    contract query.

    NULL event times are filtered out BEFORE the stateful pass (r14
    sweep): an event with no event time cannot be placed in any
    session — and the watermark does not drop such rows, so they
    reached the group function as NaT, poisoned the whole envelope to
    NaN, and ``setTimeoutTimestamp(int(nan))`` killed the query
    permanently (every checkpoint retry replays the same batch). The
    equi-join NULL-key bypass rule, applied to event time."""
    state_schema = (
        "next_id long, last_ts double, open_n long, open_start double, open_last double"
    )
    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the continuous twin of
    ``operators.dedup.exact_dedup``.

    ``dropDuplicatesWithinWatermark`` keeps state only for keys whose
    event time is still inside the watermark horizon, so state is
    bounded by arrival spread rather than stream history (a plain
    streaming ``dropDuplicates`` would grow state forever).

    Known divergence from the batch twin (r14 sweep, pinned in
    tests): rows with a NULL event time are NOT reliably
    deduplicated ACROSS micro-batches. A NULL-ts row has no place on
    the watermark timeline that bounds the dedup state; empirically
    (Spark 4.1), once the watermark has advanced past its initial
    value, an arriving NULL-ts row is treated as already-expired —
    emitted without creating a state entry — so every later copy
    passes through too. Copies sharing one micro-batch always dedup,
    and streams whose watermark never moves (no non-null event times
    yet) dedup across batches. Dropping NULL-ts rows here instead
    would silently lose events, the worse failure for a dedup
    operator. If NULL-ts duplicates matter upstream, assign an
    ingest-time fallback ``ts`` before this operator — that places
    the rows on the timeline and restores exact dedup for them."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: each micro-batch joins the (small)
    static dimension — Spark plans it as a broadcast hash join per
    batch, no stream-side state. The canonical "attach user/customer
    attributes to the event firehose" pattern; the dimension is
    re-resolved every batch, so a reloaded dim table is picked up
    without restarting the query."""
    return events.withWatermark("ts", watermark).join(
        F.broadcast(dim), on=on, how="left"
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair rows sharing ``on`` whose
    event times satisfy ``left_ts ∈ [right_ts + lower, right_ts +
    upper]``.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, so Spark can expire state: each side
    buffers only rows younger than watermark + interval width (without
    the time bound, stream-stream join state grows forever). The equi
    key keeps it a hash join partitioned by ``on`` — the range is a
    residual predicate, never a pair blow-up — which is the same
    discipline as the batch ``range_join_view_purchase`` query.
    """
    lw = left.withWatermark(left_ts, watermark)
    # suffix right-side name collisions so the joined schema is usable
    collisions = [c for c in right.columns if c in set(left.columns)]
    renamed = right.withColumnsRenamed({c: f"{c}_r" for c in collisions})
    r_on = f"{on}_r" if on in collisions else on
    r_ts = f"{right_ts}_r" if right_ts in collisions else right_ts
    rw = renamed.withWatermark(r_ts, watermark)
    cond = (
        (lw[on] == rw[r_on])
        & (lw[left_ts] >= rw[r_ts] + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (lw[left_ts] <= rw[r_ts] + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return lw.join(rw, cond, how)


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain all available input into an in-memory sink (test/dev
    helper): processes everything pending, then stops."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
