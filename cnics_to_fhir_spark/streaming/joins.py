"""Stream-stream joins with watermark-bounded state.

The reference is pure batch; this is the streaming form of the engine's
join surface. A stream-stream join must buffer both inputs until a match
can be ruled out — unbounded without constraints. Two constraints bound it:

1. watermarks on BOTH inputs (how late each side can be);
2. an event-time range in the join condition (how far apart matching rows
   can be).

Together they let the engine evict buffered rows once the other side's
watermark passes the end of their match window — state is O(rows within
the range window), independent of stream length, which is what allows the
same plan to run forever at production scale.

Inner joins emit on match; left-outer joins additionally emit the
null-padded left row once its match window expires (tests/test_streaming.py
pins both behaviors with a two-batch file source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: tuple[str, str],
    ts: tuple[str, str],
    within: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on an equi key where the right event lands inside
    ``[left_ts, left_ts + within]``.

    ``key``/``ts`` name the (left, right) columns; names must differ across
    sides (callers alias first). The equi key keeps the join
    hash-partitionable — both streams shuffle on it, co-partitioning
    matching rows onto the same state-store instance.
    """
    lk, rk = key
    lt, rt = ts
    cond = F.expr(
        f"{lk} = {rk} AND {rt} >= {lt} AND {rt} <= {lt} + interval {within}"
    )
    return (
        left.withWatermark(lt, watermark)
        .join(right.withWatermark(rt, watermark), cond, how)
    )
