"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch form (operators/events_windows.sessionize) is a lag-gap-cumsum
window; on an unbounded stream the same semantics need per-key mutable
state: an open session per user, closed either by a row arriving after the
gap or by the event-time watermark passing the session's deadline (idle
user). State is O(active users); Arrow moves each micro-batch's rows per
key in one batch, not row-at-a-time.

Scale notes: state lives in the state store partitioned by user_id — the
one shuffle; skewed users cost state-store writes, not recomputation. The
watermark bounds both dropped-late rows and state lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
# open-session accumulator: epoch-second bounds + running count/sum
STATE_SCHEMA = "start bigint, last bigint, n int, total double"


def _close(user_id: int, start: int, last: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="s")],
            "session_end": [pd.Timestamp(last, unit="s")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Emit closed sessions (append) for an unbounded event stream."""
    gap = gap_minutes * 60

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield _close(user_id, start, last, n, total)
            return

        # ignore_index is load-bearing: a group arriving as SEVERAL Arrow
        # chunks (first happens at ~10x the verification SF) would
        # otherwise carry duplicate 0-based index labels, and the
        # label-based ts[order] lookup below then returns every row with
        # that label — duplicated, misordered sessions (caught by the
        # round-6 sf10 oracle sweep: start_es > end_es rows, doubled
        # emits; sf1 groups fit one chunk so the bug was invisible).
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts = rows[ts_col].astype("int64") // 1_000_000_000
        order = ts.sort_values().index
        ts_sorted = ts[order].tolist()
        vals = rows["value"][order].tolist()

        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = ts_sorted[0], ts_sorted[0], 0, 0.0

        for t, v in zip(ts_sorted, vals):
            if n > 0 and t - last > gap:
                yield _close(user_id, start, last, n, total)
                start, n, total = t, 0, 0.0
            elif n == 0:
                start = t
            last, n, total = t, n + 1, total + v

        state.update((start, last, n, total))
        # close the open session when event time passes last+gap
        state.setTimeoutTimestamp((last + gap) * 1000)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
