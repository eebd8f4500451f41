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
    - several sessions can close inside one micro-batch (intra-batch
      gaps) — all closed sessions are emitted immediately, only the
      trailing open session occupies state;
    - event-time timeout requires a watermark: the input is watermarked
      here with ``watermark`` as the delay.
    """
    gap_ms = int(gap_s * 1000)
    ktype = dict(events.dtypes)[key]
    out_schema = (
        f"{key} {ktype}, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = "start_ms bigint, last_ms bigint, n bigint"

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
        if state.hasTimedOut:
            s_ms, l_ms, n = state.get
            state.remove()
            yield _mk(k[0], s_ms, l_ms, n)
            return
        wm = state.getCurrentWatermarkMs()
        ts_ms = sorted(
            v
            for pdf in pdfs
            for v in (pdf[ts].astype("int64") // 1_000_000).tolist()
            if v >= wm
        )
        cur = state.get if state.exists else None
        closed = []
        for v in ts_ms:
            if cur is None:
                cur = (v, v, 1)
            elif v - cur[1] <= gap_ms:
                cur = (cur[0], max(cur[1], v), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (v, v, 1)
        if cur is not None and cur[1] + gap_ms <= wm:
            # the watermark already passed the open session's horizon
            # (e.g. barely-on-time stragglers): close it now rather
            # than setting a timeout in the past (which is illegal)
            closed.append(cur)
            cur = None
        if cur is None:
            state.remove()
        else:
            state.update(cur)
            # timeouts are cleared on every invocation — re-arm even
            # when the batch carried only late (dropped) rows
            state.setTimeoutTimestamp(cur[1] + gap_ms)
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
