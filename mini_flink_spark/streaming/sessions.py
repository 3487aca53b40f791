"""Timer-driven keyed state: inactivity session flush.

The reference ships a full per-key timer service — binary-heap queues fired on
watermark advance (InternalTimerServiceImpl.java:165-169 register,
:206-215 advanceWatermark) — but nothing reachable uses it (SURVEY.md §2.8).
This is the live Spark rendering: applyInPandasWithState with an event-time
timeout. Each key accumulates a session aggregate in the state store; a
timeout is (re-)registered at last_event + gap; when the watermark passes it,
the timer fires with no input rows, the session row is emitted, and state is
cleared — exactly registerEventTimeTimer/onEventTime semantics, plus the
fault tolerance the reference never had (checkpointed state store).

Note Spark's built-in `session_window` covers the common case declaratively;
this operator exists for the *timer* parity — custom logic on timeout — and
as the template for arbitrary ProcessFunction-style operators
(ProcessFunction.java exists in the reference but is dead surface, §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def keyed_inactivity_sessions(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    gap_seconds: int,
    key_type: str = "string",
) -> DataFrame:
    """Emit one row per (key, session) once the key has been quiet for
    `gap_seconds` of event time: (key, session_start, session_end, n_events,
    sum_value). Input must already carry a watermark on `ts_col`.

    Scale: state is O(active keys); the timeout sweep is the state store's,
    not a driver loop. Append-mode output — sessions are final when emitted.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} {key_type}, session_start timestamp, session_end timestamp, "
        f"n_events bigint, sum_value double"
    )
    state_schema = "start long, end long, n long, s double"

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            start, end, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], pd.Timestamp(start, unit="us"), pd.Timestamp(end, unit="us"), n, s)],
                columns=[key_col, "session_start", "session_end", "n_events", "sum_value"],
            )
            return
        start, end, n, s = state.get if state.exists else (None, None, 0, 0.0)
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            ts_us = pdf[ts_col].astype("int64") // 1000  # ns -> µs epoch
            start = int(ts_us.min()) if start is None else min(start, int(ts_us.min()))
            end = int(ts_us.max()) if end is None else max(end, int(ts_us.max()))
            n += len(pdf)
            s += float(pdf[value_col].sum())
        if end is not None:
            state.update((start, end, n, s))
            # registerEventTimeTimer(last_event + gap): fires when the
            # watermark passes it (InternalTimerServiceImpl.java:206-215)
            state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            [], columns=[key_col, "session_start", "session_end", "n_events", "sum_value"]
        )

    return sdf.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
