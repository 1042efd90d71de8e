"""Custom stateful streaming operator: per-user session tracking via
`applyInPandasWithState` (SURVEY.md §2e streaming surface).

`session_window` (streaming/events.py) covers gap-sessions natively; this
module exists for session semantics the built-in can't express — emitting
*closed* sessions with per-session event counts AND keeping a live "open
session" row per user updated every micro-batch (a serving-layer shape:
current-session lookups while history accretes).

State model per user key:
    (session_start_us, last_ts_us, n_events)

Each micro-batch invocation folds that user's new events (sorted by ts)
into the state; any gap > `gap_minutes` closes the current session (emitted
with status='closed') and starts a new one. The still-open session is
emitted with status='open' so downstream always sees the freshest state.

Scale notes:
- State is O(active users) × 24 bytes — the minimum for gap sessions.
- A GroupStateTimeout (event-time) evicts idle users' state: without it an
  unbounded user space grows state forever. The timeout also closes the
  user's last session.
- The same fold logic runs in batch via `sessionize_fold_batch` (one
  applyInPandas pass), which is how tests cross-check the streaming path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", IntegerType()),
        StructField("status", StringType()),  # 'closed' | 'open'
    ]
)

_STATE = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def _fold(
    start_us: int | None,
    last_us: int | None,
    n: int,
    ts_list: list[int],
    gap_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Pure fold of sorted event timestamps into (closed_sessions, open_state)."""
    closed: list[tuple[int, int, int]] = []
    for ts in ts_list:
        if start_us is None:
            start_us, last_us, n = ts, ts, 1
        elif ts - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = ts, ts, 1
        else:
            last_us, n = ts, n + 1
    open_state = (start_us, last_us, n) if start_us is not None else None
    return closed, open_state


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_minutes: int | None = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-sessionization with explicit keyed state. Input must be
    a streaming DataFrame with a watermark on `ts_col` when
    `idle_timeout_minutes` is set (event-time timeouts need one)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            # idle user: close whatever session is open and drop the state
            if state.exists:
                s, l, n = state.get
                state.remove()
                yield pd.DataFrame(
                    [[user, s, l, n, "closed"]], columns=SESSION_OUTPUT.fieldNames()
                )
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                # ns → µs; arrow hands timestamps as datetime64[ns/us]
                ts_us.extend(
                    (pdf[ts_col].astype("datetime64[us]").astype("int64")).tolist()
                )
        ts_us.sort()
        s0 = state.get if state.exists else (None, None, 0)
        closed, open_state = _fold(s0[0], s0[1], s0[2], ts_us, gap_us)
        rows = [[user, s, l, n, "closed"] for (s, l, n) in closed]
        if open_state is not None:
            state.update(open_state)
            if idle_timeout_minutes is not None:
                state.setTimeoutTimestamp(
                    open_state[1] // 1000 + idle_timeout_minutes * 60 * 1000
                )
            rows.append([user, open_state[0], open_state[1], open_state[2], "open"])
        if rows:
            yield pd.DataFrame(rows, columns=SESSION_OUTPUT.fieldNames())

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(user_col).applyInPandasWithState(
        update, SESSION_OUTPUT, _STATE, "update", timeout
    )


def sessionize_fold_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin of `sessionize_stateful`: the same fold applied per user
    with `applyInPandas`. Used to cross-check streaming output; also a
    worked example of (b)-style custom operators (applyInPandas when the
    semantics need imperative per-group logic)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        user = pdf["user_id"].iloc[0]
        ts_us = sorted(pdf[ts_col].astype("datetime64[us]").astype("int64").tolist())
        closed, open_state = _fold(None, None, 0, ts_us, gap_us)
        rows = [[user, s, l, n, "closed"] for (s, l, n) in closed]
        if open_state is not None:
            rows.append([user, open_state[0], open_state[1], open_state[2], "open"])
        return pd.DataFrame(rows, columns=SESSION_OUTPUT.fieldNames())

    src = events.select(events[user_col].alias("user_id"), events[ts_col])
    return src.groupBy("user_id").applyInPandas(run, SESSION_OUTPUT)
