"""Event-time windowed aggregation + custom stateful sessionization.

The reference is batch-only; these are the Structured-Streaming-native
operators a continuous-crawl curation pipeline needs on top of the
``foreachBatch`` ingest path (ingest.py):

- ``windowed_event_counts`` / ``sliding_window_counts`` — tumbling /
  sliding event-time window aggregation. One code path for batch and
  streaming DataFrames: ``F.window`` groups identically in both; on a
  streaming input a watermark bounds state so late data past the delay
  is dropped and window state is evicted (without it, 10^12-event state
  grows forever).
- ``sessionize_stateful`` — gap-based sessionization as a CUSTOM
  stateful operator via ``applyInPandasWithState``: per-key open-session
  state, event-time timeout closes a session ``gap`` after its last
  event once the watermark passes. The batch twin (window + lag + cumsum
  in plans/driver_queries.q_sessionize) is the oracle: closed sessions
  must match it exactly (asserted in tests/test_streaming.py).

Scale shape: both operators shuffle once on the grouping key; state per
key is O(1) (one open session / one window accumulator), and the
watermark guarantees eviction, so total state is bounded by the number
of ACTIVE keys in the watermark horizon, not by corpus history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows: (key, window_start, n_events,
    total_value). ``window_start`` is emitted as epoch seconds (BIGINT)
    so the output is oracle-comparable and sink-friendly.

    On a streaming DataFrame the watermark both drops late rows (later
    than ``watermark`` behind the max seen event time) and lets the sink
    finalize windows in append mode; on a batch DataFrame
    ``withWatermark`` is a documented no-op, so one function serves both
    (the byte-identical single-code-path rule from ingest.py).
    """
    ts = F.col(ts_col).cast("timestamp")
    df = events.withColumn("_ts", ts)
    if events.isStreaming and watermark is not None:
        df = df.withWatermark("_ts", watermark)
    return (
        df.groupBy(F.window("_ts", window_dur).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window_dur: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Sliding event-time windows (each row lands in dur/slide windows,
    starts aligned to the slide). Same output contract as
    ``windowed_event_counts``."""
    ts = F.col(ts_col).cast("timestamp")
    df = events.withColumn("_ts", ts)
    if events.isStreaming and watermark is not None:
        df = df.withWatermark("_ts", watermark)
    return (
        df.groupBy(F.window("_ts", window_dur, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


SESSION_OUTPUT_DDL = (
    "user_id long, session_start long, session_end long, "
    "n_events long, session_value double"
)
_SESSION_STATE_DDL = "start long, end long, n long, v double"


def sessionize_stateful(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    Per ``key_col`` the state is the single OPEN session (start, end,
    count, value-sum — 32 bytes). Each invocation merges the batch's
    rows (sorted by event time) into it, emits every session that a
    ``gap_sec`` gap closes, and arms an event-time timeout at
    ``session_end + gap`` for the still-open one; the timeout fires once
    the watermark passes and flushes the session. Timestamps are epoch
    seconds in the output (BIGINT, oracle-comparable).

    Late rows older than the open session's end minus the watermark are
    handled by Spark's watermark filter before grouping — this operator
    only ever sees rows it is allowed to mutate state with.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_sec * 1000

    def fn(key, pdf_iter, state):
        (uid,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [uid],
                        "session_start": [s],
                        "session_end": [e],
                        "n_events": [n],
                        "session_value": [v],
                    }
                )
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values("_ts_sec", kind="stable")
        cur = list(state.get) if state.exists else None
        closed = []
        for t, val in zip(rows["_ts_sec"].to_numpy(), rows["_val"].to_numpy()):
            t = int(t)
            val = float(val) if val == val else 0.0
            if cur is None:
                cur = [t, t, 1, val]
            elif t - cur[1] > gap_sec:
                closed.append(cur)
                cur = [t, t, 1, val]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += val
        state.update(tuple(cur))
        # the timeout must sit strictly ahead of the current watermark;
        # if the open session's deadline already passed (its rows arrived
        # just inside the allowed lateness), fire on the next tick
        deadline = max(cur[1] * 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(deadline)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [c[3] for c in closed],
                }
            )

    ts = F.col(ts_col).cast("timestamp")
    prepared = (
        events.withColumn("_ts", ts)
        .withWatermark("_ts", watermark)
        .select(
            F.col(key_col).alias("user_id"),
            "_ts",
            F.col("_ts").cast("long").alias("_ts_sec"),
            F.col(value_col).alias("_val"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_DDL,
        stateStructType=_SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
