"""As-of (point-in-time) join — a custom operator Spark's API lacks.

Joins each left-side event to the most recent right-side row with
``r.ts <= l.ts`` per key. The naive form is a range join (an O(n·m)
explosion per key); the scalable form used here is union + windowed
last-carry-forward:

  1. tag both inputs and union them (no join at all),
  2. one shuffle: partition by key, order by (ts, side) — right rows sort
     before left rows at equal timestamps so "<=" semantics hold,
  3. ``last(right_payload, ignorenulls=True)`` over rows-unbounded-preceding
     carries the latest right row forward,
  4. keep left rows.

Cost at 100 TB: exactly one shuffle of left+right keyed on the join key —
the same price as a regular sort-merge join, with no range-explosion. Skewed
keys fall to AQE skew handling; a hot single key can additionally be
windowed by coarse time-bucket pre-aggregation of the right side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-renamed payload
    (and timestamp) of the latest ``right`` row at-or-before its timestamp
    (NULLs when no prior right row exists)."""
    payload_cols = payload_cols or ["value"]
    payload = F.struct(F.col(ts_col).alias("ts"), *[F.col(c) for c in payload_cols])

    r = right.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_side"), payload.alias("_r")
    )
    l = left.withColumn("_side", F.lit(1)).withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType))

    u = l.unionByName(r, allowMissingColumns=True)
    # Deterministic tiebreak among right rows sharing (key, ts): order the
    # payload struct DESCENDING so ``last`` lands on the struct-min row —
    # both engines (and repeated runs) then pick the same row even when the
    # right side has duplicate timestamps. Left rows all carry a null ``_r``
    # so the extra key never reorders them relative to each other.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"), F.col("_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m.ts").alias(f"{prefix}{ts_col}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols)
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "next_",
) -> DataFrame:
    """Forward as-of join: every ``left`` row, plus the EARLIEST ``right``
    row at-or-after its timestamp (next-event attribution: "first view
    after the click").  Mirror of ``asof_join``: union + one shuffle +
    a following-window ``first(ignorenulls)`` — right rows sort AFTER
    left rows at equal timestamps so ">=" includes the simultaneous row.
    Same cost shape: one keyed shuffle, no range explosion."""
    payload_cols = payload_cols or ["value"]
    payload = F.struct(F.col(ts_col).alias("ts"), *[F.col(c) for c in payload_cols])

    r = right.select(
        F.col(on), F.col(ts_col), F.lit(2).alias("_side"), payload.alias("_r")
    )
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(r.schema["_r"].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # Deterministic tiebreak (mirror of the backward join): ascending ``_r``
    # makes ``first`` land on the struct-min right row among equal (key, ts).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"), F.col("_r"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = u.withColumn("_m", F.first("_r", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m.ts").alias(f"{prefix}{ts_col}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols)
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "matched_",
    tolerance_seconds: int = 600,
) -> DataFrame:
    """As-of join with a staleness bound: the latest right row at-or-before
    the left timestamp counts only if it is at most ``tolerance_seconds``
    old — older matches become NULLs, exactly like pandas ``merge_asof``'s
    ``tolerance``.  A point-in-time feature older than the bound is a
    feature you must NOT train on (it leaks a stale world state), so the
    tolerance is a correctness knob, not an optimization.

    Because the carried match is always the LATEST prior right row, any
    match inside the window IS that latest row — so the bound is a pure
    post-projection on ``asof_join``'s output: same single keyed shuffle,
    no extra pass, and the window logic stays in one place."""
    payload_cols = payload_cols or ["value"]
    out = asof_join(
        left, right, on=on, ts_col=ts_col, payload_cols=payload_cols, prefix=prefix
    )
    mts = F.col(f"{prefix}{ts_col}")
    fresh = mts.isNotNull() & (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(mts)
        <= F.lit(tolerance_seconds)
    )
    proj = [F.col(c) for c in left.columns]
    proj.append(F.when(fresh, mts).alias(f"{prefix}{ts_col}"))
    proj.extend(
        F.when(fresh, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
        for c in payload_cols
    )
    return out.select(*proj)
