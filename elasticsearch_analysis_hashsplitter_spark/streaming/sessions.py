"""Sessionization: gap-based session windows over event streams.

Two flavors with identical semantics:

* ``sessionize_batch`` — pure Catalyst (lag + cumulative sum over a
  per-user window): the batch form, SQL-expressible, and the oracle for
  the streaming form.
* ``sessionize_stream`` — ``applyInPandasWithState`` custom stateful
  operator: per-user open-session state across micro-batches, sessions
  emitted when closed by a gap-exceeding event or by processing-time
  timeout. The vectorized state update handles each user's events as
  numpy arrays (no per-event Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)

STATE_SCHEMA = "start long, end long, n long, v double"


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds the gap. -> SESSION_SCHEMA rows."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    with_flag = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ).withColumn(
        # TIMESTAMP_NTZ has no direct long cast; go via timestamp
        "ts_s",
        F.col("ts").cast("timestamp").cast("long"),
    ).withColumn(
        "new_session",
        (
            F.col("ts_s")
            - F.lag("ts_s").over(
                Window.partitionBy("user_id").orderBy("ts")
            )
            > gap
        )
        .cast("int"),
    ).withColumn(
        "session_idx",
        F.sum(F.coalesce("new_session", F.lit(1))).over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_flag.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("session_idx")
    )


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    flush_timeout_seconds: int | None = None,
):
    """Streaming sessionizer via applyInPandasWithState.

    Emits a session row whenever a user's open session is closed by an
    event arriving more than ``gap`` after the session's end. By default
    sessions still open when the stream drains remain in state (the
    deterministic choice for a continuous pipeline). With
    ``flush_timeout_seconds`` set, a processing-time timeout flushes a
    user's open session after that much wall-clock inactivity — the
    liveness knob for dashboards/TTL sinks; emitted rows are identical to
    what a later gap-closing event would emit, only earlier, so the union
    of flushed + closed sessions still equals the batch answer on a
    drained stream.

    NOTE: with a timeout set, run under a continuous trigger and stop the
    query explicitly — ``trigger(availableNow=True)`` never terminates,
    because Spark keeps scheduling wake-up micro-batches to service
    pending state timeouts (observed on Spark 4.1: the drained query kept
    emitting empty batches indefinitely). Timeout-flush is a
    continuous-pipeline feature; drain-and-stop jobs should use the
    default (no timeout) and read open sessions from state, or close them
    with a sentinel max-timestamp event per user.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    timeout_ms = (
        int(flush_timeout_seconds * 1000) if flush_timeout_seconds else None
    )

    def update(key, pdfs, state):
        import numpy as np

        user_id = key[0]
        if timeout_ms is not None and state.hasTimedOut:
            cur = list(state.get)
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": pd.to_datetime([cur[0]], unit="us"),
                    "session_end": pd.to_datetime([cur[1]], unit="us"),
                    "n_events": [cur[2]],
                    "sum_value": [round(cur[3], 4)],
                }
            )
            return
        ts_all, val_all = [], []
        for pdf in pdfs:
            ts_all.append(
                pdf[ts_col].astype("datetime64[us]").astype("int64")
            )
            val_all.append(pdf[value_col].astype(float))
        ts = np.concatenate([a.to_numpy() for a in ts_all])
        vals = np.concatenate([a.to_numpy() for a in val_all])
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]

        # vectorized segmentation: gap-exceeding inter-event deltas split
        # the batch into candidate sessions (no per-event Python)
        breaks = (np.flatnonzero(np.diff(ts) > gap_us) + 1).tolist()
        starts = [0] + breaks
        ends = breaks + [len(ts)]
        segs = [
            [
                int(ts[s]),
                int(ts[e - 1]),
                int(e - s),
                float(vals[s:e].sum()),
            ]
            for s, e in zip(starts, ends)
        ]

        out = []
        if state.exists:
            cur = list(state.get)
            if segs and segs[0][0] - cur[1] <= gap_us:
                # first segment continues the open session
                merged = segs[0]
                segs[0] = [
                    cur[0],
                    merged[1],
                    cur[2] + merged[2],
                    cur[3] + merged[3],
                ]
            else:
                out.append((user_id, *cur))
        for seg in segs[:-1]:
            out.append((user_id, *seg))
        if segs:
            state.update(tuple(segs[-1]))
        if timeout_ms is not None and state.exists:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime(
                        [o[1] for o in out], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "n_events": [o[3] for o in out],
                    "sum_value": [round(o[4], 4) for o in out],
                }
            )

    return events_stream.groupBy(user_col).applyInPandasWithState(
        update,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
