"""Sessionization (SURVEY §2.9 extension): inactivity-gap session
windows over the event stream.

The reference has no sessionization, but its session-context dimension
(``dim_session_context.sql``) is exactly the grain a clickstream
pipeline sessionizes next — this module supplies the two Spark-native
forms:

- :func:`session_aggregate` — the declarative path: ``F.session_window``
  groupBy, identical code for batch and streaming (watermark attaches
  only on a streaming input). Catalyst owns merging/eviction; this is
  the form to prefer whenever the per-session output is an aggregate.
- :func:`sessionize_stateful` — the custom-operator path:
  ``applyInPandasWithState`` with event-time timeout, for session logic
  the built-in window can't express (running state machines, per-session
  caps, custom eviction). Arrow-batched; state per key is O(1).

Scale: both forms shuffle once on the session key (user_id). State
store size is bounded by (open sessions) × O(1) state; the watermark
evicts closed sessions, so 100 TB of history never accumulates —
only the active-user working set does.

Session semantics (both forms, matching Spark's session_window, pinned
by experiment + tests): successive events of one key stay in one
session while each gap is AT MOST ``gap`` (a gap of exactly ``gap``
merges); the session's end is ``last_ts + gap``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = "30 minutes"


def session_aggregate(
    events: DataFrame,
    gap: str = SESSION_GAP,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Per-(key, session) rollup via the native session window.

    Returns one row per closed session: key, session_start (first
    event), session_end (last event + gap), n_events, total_value.
    Works identically over a batch frame (watermark no-op) and a stream
    (watermark drives state eviction)."""
    df = events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# state tuple layout for sessionize_stateful
_STATE_SCHEMA = "start long, last long, n long, total double"
_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionizer over ``applyInPandasWithState``.

    Same output contract as :func:`session_aggregate`, built by hand:
    per-key state holds the open session (start, last event, count,
    value sum); a batch's rows fold into it in event-time order, closed
    sessions are emitted immediately, and the still-open session is
    emitted when the event-time timeout fires (watermark passed
    ``last + gap``). This is the template for session logic the
    built-in window can't express — swap the fold body, keep the
    state/timeout plumbing.

    Streaming input only (batch DataFrames have no state store — use
    :func:`session_aggregate`, which is equivalent there).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us: int, last_us: int, n: int, total: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield emit(start, last, n, total)
            return

        ts_us = []
        vals = []
        for pdf in pdfs:
            t = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000  # ns -> us
            ts_us.extend(int(x) for x in t)
            vals.extend(
                float(v) if pd.notna(v) else 0.0 for v in pdf["value"]
            )
        order = sorted(range(len(ts_us)), key=lambda i: ts_us[i])

        start, last, n, total = state.get if state.exists else (None, None, 0, 0.0)
        for i in order:
            t, v = ts_us[i], vals[i]
            if start is None:
                start, last, n, total = t, t, 1, v
            elif t - last <= gap_us:
                last, n, total = max(last, t), n + 1, total + v
            else:
                yield emit(start, last, n, total)
                start, last, n, total = t, t, 1, v
        state.update((start, last, n, total))
        # evict when the watermark passes the open session's close time
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms epoch

    stream = events.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withWatermark(ts_col, watermark_delay)
    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
