"""Custom stateful streaming operator: inactivity-gap sessionization.

The batch twin (queries/relational.py q:`events_sessionize`, duckdb-
checked) defines the semantics: a session is a maximal run of one user's
events where consecutive gaps are <= ``gap_seconds``. This is the
streaming form, built on ``applyInPandasWithState`` — the extension point
Structured Streaming provides for operators its built-ins can't express
(``session_window`` covers windowed aggs; carrying arbitrary per-session
aggregates like total_value through keyed state is the general shape).

State: one open session per user — (start_us, end_us, n, total_value).
Emission: a session row is emitted when
  * a new event lands more than the gap after the open session's end
    (gap-triggered close), or
  * the event-time watermark passes end + gap (timeout close — fires in
    the trailing no-data microbatch).

At scale: state is O(active users), shuffled once on user_id; the
watermark bounds both state retention and late-event acceptance —
exactly the knobs a 100 TB/day event stream needs.
"""

from __future__ import annotations

import pandas as pd

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start_us long, end_us long, n long, total_value double"

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(key, pdf_iter, state):
        user_id = key[0]
        closed = []

        if state.hasTimedOut:
            start_us, end_us, n, tv = state.get
            closed.append((user_id, start_us, end_us, n, tv))
            state.remove()
            yield _to_pdf(closed)
            return

        cur = state.get if state.exists else None
        events = []
        for pdf in pdf_iter:
            events.append(pdf[["ts", "value"]])
        if events:
            batch = pd.concat(events).sort_values("ts")
            for ts, value in zip(batch["ts"], batch["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns -> us
                v = float(value) if value == value else 0.0
                if cur is None:
                    cur = (ts_us, ts_us, 1, v)
                elif ts_us - cur[1] > gap_us:
                    closed.append((user_id, *cur))
                    cur = (ts_us, ts_us, 1, v)
                elif cur[0] - ts_us > gap_us:
                    # a LATE event admitted by a nonzero watermark that
                    # predates the open session by more than the gap: it
                    # can never belong to this session (nor to any later
                    # one), so it closes immediately as its own session —
                    # merging it forward would corrupt both the count and
                    # the start timestamp
                    closed.append((user_id, ts_us, ts_us, 1, v))
                else:
                    # within-gap events extend the session in BOTH
                    # directions: a late-but-in-gap event lowers
                    # session_start (the batch twin takes min(ts))
                    cur = (
                        min(cur[0], ts_us),
                        max(cur[1], ts_us),
                        cur[2] + 1,
                        cur[3] + v,
                    )
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)  # ms
        yield _to_pdf(closed)

    return fn


def _to_pdf(closed):
    return pd.DataFrame(
        {
            "user_id": [c[0] for c in closed],
            "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
            "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
            "n_events": [c[3] for c in closed],
            "total_value": [round(c[4], 6) for c in closed],
        }
    )


def sessionize_stream(events, *, gap_seconds: int = 1800, watermark: str = "0 seconds"):
    """events: streaming DataFrame with (user_id, ts, value). Returns the
    append-mode stream of CLOSED sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
