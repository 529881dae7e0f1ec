"""Stateful Structured Streaming operators over the events stream.

Two canonical large-scale patterns (SURVEY §1.4 notes the reference has no
streaming surface; these extend the engine the way a training-data
pipeline consumes event/telemetry streams):

  * windowed_event_counts — watermark + tumbling-window aggregation.
    Late data beyond the watermark is dropped; in append mode a window
    emits exactly once, when the watermark passes its end. State size is
    bounded by (windows in flight × distinct event types) — safe at any
    scale.

  * sessionize_stream — CUSTOM stateful sessionization with
    ``applyInPandasWithState``: per-user state (session start, last event
    time, event count); a session closes when the next event arrives
    after the idle gap (emitted immediately, deterministic) or when the
    event-time watermark passes last_ts + gap (timeout flush). This is
    the stream twin of the batch lag-window sessionization
    (__spark_entry__.q_event_sessions) — the batch/stream pair shares the
    same gap semantics, so results reconcile (every emitted session is a
    batch session; every session closed by in-data evidence is emitted).

Scale notes: state is partitioned by user_id (the natural shuffle key);
per-group state is O(1) (three scalars), so 10^9 users is bounded by the
state store, not the operator. Arrow batches keep the python hop
vectorized; no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),  # epoch seconds
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window per-event-type counts with late-data watermark.
    Works on both a streaming and a batch events DataFrame (same plan).

    BATCH TIMESTAMP_NTZ inputs stay NTZ (F.window supports it) so window
    bounds are session-timezone-independent — casting NTZ through
    TIMESTAMP would shift walls with the session zone (same reasoning as
    the batch sessionization's timestampdiff-on-NTZ). STREAMING inputs
    must cast: withWatermark requires TIMESTAMP event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise)."""
    ts_type = dict(events.dtypes).get("ts", "")
    e = events
    if events.isStreaming or not ts_type.startswith("timestamp"):
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def _session_func(gap_seconds: float):
    def func(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed last_ts + gap: flush the open session
            if state.exists:
                start_ts, last_ts, n = state.get
                closed.append((user_id, start_ts, last_ts, n))
                state.remove()
        else:
            ts_vals: list[float] = []
            for pdf in pdf_iter:
                ts_vals.extend(
                    pdf["ts"].astype("datetime64[ns]").astype("int64") / 1e9
                )
            ts_vals.sort()
            if state.exists:
                start_ts, last_ts, n = state.get
            else:
                start_ts, last_ts, n = None, None, 0
            for ts in ts_vals:
                if last_ts is not None and ts - last_ts > gap_seconds:
                    closed.append((user_id, start_ts, last_ts, n))
                    start_ts, n = ts, 0
                elif last_ts is None:
                    start_ts = ts
                n += 1
                last_ts = ts
            state.update((start_ts, last_ts, n))
            # event-time timeout at last_ts + gap (ms)
            state.setTimeoutTimestamp(int((last_ts + gap_seconds) * 1000))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return func


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState). Emits one
    row per CLOSED session: (user_id, session_start, session_end,
    n_events), epoch-second bounds."""
    e = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts")
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
