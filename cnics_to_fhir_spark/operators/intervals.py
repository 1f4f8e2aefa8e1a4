"""Distributed range (point-in-interval) join.

The reference has no range joins (SURVEY.md §2.3 "No theta/range/as-of/
interval joins"); this is a scale extension. Spark's built-in planner turns
a pure range predicate (no equi component) into BroadcastNestedLoopJoin or
CartesianProduct — O(|points|·|intervals|) work that is catastrophic at
100 TB. The classic fix, implemented here:

1. bucketize the time axis with width W seconds;
2. a point belongs to exactly one bucket: ``floor(p/W)``;
3. an interval [s, e) is REPLICATED to every bucket it overlaps:
   ``sequence(floor(s/W), floor(e/W))`` exploded — at most
   ``len/W + 1`` copies, so choose W near the typical interval length
   (replication ≤ 2×);
4. equi-join on the bucket id (hash-partitioned both sides, one shuffle
   each, AQE-coalesced) with the exact range condition as a residual
   predicate.

The result is identical to the naive theta join (tests/test_intervals.py
asserts both equality with the naive plan on a fixture and the absence of
any nested-loop/cartesian node in the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with start <= point < end.

    ``point_col``/``start_col``/``end_col`` are numeric (epoch-seconds)
    columns; all other columns from both sides are carried through. Column
    names must not collide across the two inputs (callers select/alias
    first).

    ``how`` may be 'inner' or 'left' (points are NOT replicated, so
    left-outer null-extension is exact). 'right'/'outer' would emit one
    null-extended row per bucket REPLICA of every unmatched interval and
    are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "point_in_interval_join supports how='inner'/'left' only: "
            "interval bucket replicas duplicate null-extended rows under "
            "right/full-outer joins"
        )
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    w = F.lit(int(bucket_seconds))
    pts = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    # end is exclusive: an interval touching a bucket boundary exactly at
    # its end does not need that bucket, but floor((e-1)/W) complicates
    # integer-vs-float semantics; one extra empty bucket copy is harmless.
    itv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w))),
    )
    cond = (
        (pts["__bucket"] == itv["__bucket"])
        & (pts[point_col] >= itv[start_col])
        & (pts[point_col] < itv[end_col])
    )
    return pts.join(itv, cond, how).drop("__bucket")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    *,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Interval × interval overlap join (half-open: a_start < b_end AND
    b_start < a_end) with no equi key, as a bucketized hash join.

    BOTH sides replicate to every width-W bucket they cover; a qualifying
    pair shares every bucket the overlap region touches, so to emit each
    pair exactly once the join is anchored to the single bucket containing
    ``greatest(a_start, b_start)`` — that instant lies inside both
    intervals whenever they overlap, so the anchor bucket is always among
    the shared copies.  Replication is ``len/W + 1`` per row: choose W
    near the typical interval length of the LONGER side and the blowup
    stays ≤ 2×.  The residual overlap predicate runs as a post-join
    filter; no nested-loop or cartesian node exists in the plan
    (tests/test_intervals.py asserts equality with the naive theta join
    and the plan shape).  As with ``point_in_interval_join``, column
    names must not collide across the two inputs — callers select/alias
    first.

    Only ``how='inner'`` is supported: both sides are exploded to bucket
    replicas before the join, so a non-inner join would emit one
    null-extended row per REPLICA of every unmatched (or
    non-anchor-bucket) interval — ~(len/W + 1)× duplicated outer rows.
    Outer semantics would need a post-join replica dedup; unsupported
    until someone needs it.
    """
    if how != "inner":
        raise ValueError(
            "interval_overlap_join supports how='inner' only: bucket "
            "replication duplicates null-extended rows under outer joins"
        )
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    w = F.lit(int(bucket_seconds))
    aa = a.withColumn(
        "__ba",
        F.explode(F.sequence(F.floor(F.col(a_start) / w), F.floor(F.col(a_end) / w))),
    )
    bb = b.withColumn(
        "__bb",
        F.explode(F.sequence(F.floor(F.col(b_start) / w), F.floor(F.col(b_end) / w))),
    )
    cond = (
        (aa["__ba"] == bb["__bb"])
        & (aa[a_start] < bb[b_end])
        & (bb[b_start] < aa[a_end])
        & (aa["__ba"] == F.floor(F.greatest(aa[a_start], bb[b_start]) / w))
    )
    return aa.join(bb, cond, how).drop("__ba", "__bb")
