"""Custom stateful streaming operators (applyInPandasWithState).

The reference engine has no event-time semantics at all (its scheduler
is an async worker pool — SURVEY.md §2.12); these operators are the
forward-looking streaming surface a training-data pipeline needs on
top of the crawl output: gap sessionization as a *stateful streaming*
operator whose closed-session output matches the batch window
formulation (gate `q_sessionize`) on the same events.

Scale shape: state is partitioned by the group key exactly like a
streaming aggregation — one hash exchange on the key, per-key state in
the state store, Arrow-batched Python transitions. No per-key
collect, no driver state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

__all__ = ["sessionize_stream"]


def sessionize_stream(
    events: DataFrame,
    gap_s: float,
    key: str = "user_id",
    ts: str = "ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming gap sessionization: consecutive events of the same
    ``key`` closer than ``gap_s`` seconds belong to one session; a
    session CLOSES (and is emitted, append-mode) when the event-time
    watermark passes ``last_event + gap`` — i.e. no on-time event can
    extend it any more.

    Output: ``(key, session_start, session_end, n_events)`` with
    session bounds = first/last event time (matching the batch
    `q_sessionize` gap rule). Sessions still open when the stream ends
    stay in the state store (exactly-once across restarts via the
    query checkpoint); a later event — even on another key — advances
    the global watermark and flushes them.

    Semantics notes:
    - events older than the current watermark are dropped (the same
      late-data rule `withWatermark` gives a windowed agg);
    - state holds the LIST of still-open sessions (exactly like Spark's
      native streaming ``session_window``), and a session is emitted
      only once the watermark passes ``last_event + gap`` — never
      eagerly on an intra-batch gap. That is what makes the operator
      correct for out-of-order arrivals within the watermark delay: an
      on-time event landing between (or before) open sessions merges
      them interval-style and can extend ``session_start`` backwards,
      so the closed output equals the batch gap rule on the same
      events;
    - event-time timeout requires a watermark: the input is watermarked
      here with ``watermark`` as the delay.
    """
    gap_ms = int(gap_s * 1000)
    ktype = dict(events.dtypes)[key]
    out_schema = (
        f"{key} {ktype}, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = (
        "starts array<bigint>, lasts array<bigint>, ns array<bigint>"
    )

    def _mk(kval, s_ms, l_ms, n):
        return pd.DataFrame(
            {
                key: [kval],
                "session_start": [pd.Timestamp(s_ms, unit="ms")],
                "session_end": [pd.Timestamp(l_ms, unit="ms")],
                "n_events": [n],
            }
        )

    def fn(k, pdfs, state):
        # one transition for both entry reasons (new data / timeout):
        # fold on-time events into the open-session list interval-style,
        # close every session whose horizon the watermark has passed,
        # keep the rest. On timeout pdfs is empty and this reduces to
        # the close/keep sweep.
        wm = state.getCurrentWatermarkMs()
        sessions = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [
                (int(s), int(l), int(n))
                for s, l, n in zip(starts, lasts, ns)
            ]
        ts_ms = sorted(
            v
            for pdf in pdfs
            for v in (pdf[ts].astype("int64") // 1_000_000).tolist()
            if v >= wm
        )
        if ts_ms:
            sessions.extend((v, v, 1) for v in ts_ms)
            sessions.sort()
            merged = []
            for s, l, n in sessions:
                if merged and s - merged[-1][1] <= gap_ms:
                    ps, pl, pn = merged[-1]
                    merged[-1] = (ps, max(pl, l), pn + n)
                else:
                    merged.append((s, l, n))
            sessions = merged
        closed = [t for t in sessions if t[1] + gap_ms <= wm]
        kept = [t for t in sessions if t[1] + gap_ms > wm]
        if kept:
            state.update(
                (
                    [t[0] for t in kept],
                    [t[1] for t in kept],
                    [t[2] for t in kept],
                )
            )
            # timeouts are cleared on every invocation — re-arm at the
            # EARLIEST open horizon (strictly > wm by the kept filter)
            state.setTimeoutTimestamp(min(t[1] + gap_ms for t in kept))
        else:
            state.remove()
        if closed:
            yield pd.concat(
                [_mk(k[0], s, l, n) for (s, l, n) in closed],
                ignore_index=True,
            )

    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
