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
            # First merge the batch's OWN events into maximal gap-runs,
            # then fold each run into the open session as an interval.
            # Folding events one at a time instead would emit two
            # mutually-in-gap LATE events as two single-event sessions
            # (each compared only against the much-later open session) —
            # diverging from the batch twin's maximal-run semantics.
            runs: list[tuple] = []
            r: list | None = None
            for ts, value in zip(batch["ts"], batch["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns -> us
                v = float(value) if value == value else 0.0
                if r is None:
                    r = [ts_us, ts_us, 1, v]
                elif ts_us - r[1] > gap_us:
                    runs.append(tuple(r))
                    r = [ts_us, ts_us, 1, v]
                else:
                    r[1] = ts_us
                    r[2] += 1
                    r[3] += v
            if r is not None:
                runs.append(tuple(r))
            for run in runs:
                if cur is None:
                    cur = run
                elif run[1] >= cur[0] - gap_us and run[0] <= cur[1] + gap_us:
                    # within gap of the open session on either side —
                    # merge (a late-but-in-gap run lowers session_start;
                    # the batch twin takes min(ts))
                    cur = (
                        min(cur[0], run[0]),
                        max(cur[1], run[1]),
                        cur[2] + run[2],
                        cur[3] + run[3],
                    )
                elif run[1] < cur[0]:
                    # a LATE run admitted by a nonzero watermark that
                    # still predates the open session by more than the
                    # gap: it can never belong to this or any later
                    # session — closes immediately as one session
                    closed.append((user_id, *run))
                else:
                    closed.append((user_id, *cur))
                    cur = run
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
