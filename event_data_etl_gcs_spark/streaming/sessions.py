"""Streaming sessionization with explicit event-time state timeout.

The batch engine sessionizes with a lag-window + running-sum
(queries/analytics.py sessionize). On an unbounded stream that shape
can't work — a session is only "closed" once the watermark proves no
more events can join it. ``stateful_sessionize`` is the streaming form:
per-user open-session state in ``applyInPandasWithState``, closed either
by a later event arriving past the inactivity gap or by an
``EventTimeTimeout`` firing when the watermark passes
``session_end + gap``. Sessions are emitted exactly once, when closed
(append semantics) — the flatMapGroupsWithState sessionization pattern,
expressed through the PySpark Arrow state API.

Scale/state notes:
  * State per key is one fixed-width tuple (start, end, n) — not the
    session's events; memory is O(active users), not O(events).
  * The timeout is EVENT-time: idle keys are evicted as the watermark
    advances, so state can't grow unboundedly on churned users, and
    results are reproducible on replay (no wall-clock dependence). A
    ProcessingTimeTimeout variant would evict on wall-clock idleness
    instead — deliberately not used here because replaying history would
    then close sessions nondeterministically.
  * Correct session assembly assumes per-key events arrive no more than
    ``watermark`` out of order (the watermark contract): events are
    sorted within each micro-batch, merged into the open session, and a
    gap splits eagerly. An event later than the gap but within the
    watermark reopens nothing — matching batch semantics only under
    ordered-enough arrival, which the file-source tests stage explicitly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ._util import ensure_tz_timestamp

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)


def _sessions_df(key_val: Any, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key_val] * len(sessions),
            "session_start": [pd.to_datetime(s, unit="us") for s, _, _ in sessions],
            "session_end": [pd.to_datetime(e, unit="us") for _, e, _ in sessions],
            "n_events": [n for _, _, n in sessions],
        }
    )


def _make_sessionize_fn(gap_us: int, ts_col: str):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Watermark passed session_end + gap: no event can extend it.
            start, end, n = state.get
            state.remove()
            yield _sessions_df(key[0], [(start, end, n)])
            return
        ts_us: list[int] = []
        for pdf in batches:
            ts_us.extend(int(v) for v in pdf[ts_col].astype("int64") // 1000)
        ts_us.sort()
        open_s: tuple[int, int, int] | None = state.get if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if open_s is None:
                open_s = (t, t, 1)
            elif t - open_s[1] <= gap_us:
                open_s = (open_s[0], max(open_s[1], t), open_s[2] + 1)
            else:
                closed.append(open_s)
                open_s = (t, t, 1)
        state.update(open_s)
        # EventTimeTimeout takes epoch MILLIS; fire once the watermark
        # proves the gap after the open session's last event has elapsed.
        state.setTimeoutTimestamp((open_s[1] + gap_us) // 1000 + 1)
        if closed:
            yield _sessions_df(key[0], closed)

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str | None = "2 days",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-user session windows (30-min inactivity gap by default) over a
    streaming frame; emits each session exactly once, when closed. Use
    outputMode('append').

    ``watermark=None`` means the INPUT already carries one — required
    when composing after another stateful operator (e.g.
    dropDuplicatesWithinWatermark): Spark disallows redefining the
    watermark between stateful operators in one query."""
    gap_us = gap_minutes * 60 * 1_000_000
    events = ensure_tz_timestamp(events, ts_col)
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _make_sessionize_fn(gap_us, ts_col),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
