"""Range-join operator contract (operators/intervals.py).

Two guarantees: (1) the bucketized join returns exactly the rows the naive
theta join returns, including boundary cases; (2) the physical plan is an
equi-join — no BroadcastNestedLoopJoin / CartesianProduct node, which is
what Spark plans for a bare range predicate and what must never run at
scale.
"""

from __future__ import annotations

import pytest

from cnics_to_fhir_spark.operators.intervals import point_in_interval_join


@pytest.fixture(scope="module")
def frames(spark):
    # Boundary battery: points at interval start (in), end (out), one below
    # start (out), bucket-straddling intervals, zero-length interval (empty),
    # overlapping intervals (point matches both).
    points = spark.createDataFrame(
        [(1, 100), (2, 699), (3, 700), (4, 99), (5, 1205), (6, 40)],
        "pid int, p long",
    )
    intervals = spark.createDataFrame(
        [
            (10, 100, 700),   # [100, 700): pids 1, 2
            (11, 650, 1300),  # straddles buckets; pids 2, 3, 5
            (12, 500, 500),   # empty
            (13, 0, 101),     # pids 4, 6, 1
        ],
        "iid int, s long, e long",
    )
    return points, intervals


def expected_pairs(points, intervals):
    naive = points.join(
        intervals,
        (points["p"] >= intervals["s"]) & (points["p"] < intervals["e"]),
    )
    return sorted((r.pid, r.iid) for r in naive.collect())


def test_matches_naive_theta_join(spark, frames):
    points, intervals = frames
    got = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bucket_seconds=600
    )
    assert sorted((r.pid, r.iid) for r in got.collect()) == expected_pairs(points, intervals)
    assert set(got.columns) == {"pid", "p", "iid", "s", "e"}  # helper bucket dropped


@pytest.mark.parametrize("w", [1, 7, 600, 10_000])
def test_bucket_width_is_semantics_free(spark, frames, w):
    points, intervals = frames
    got = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bucket_seconds=w
    )
    assert sorted((r.pid, r.iid) for r in got.collect()) == expected_pairs(points, intervals)


def test_plan_is_equi_join(spark, frames):
    points, intervals = frames
    got = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bucket_seconds=600
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_nonpositive_bucket(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        point_in_interval_join(
            points, intervals, point_col="p", start_col="s", end_col="e", bucket_seconds=0
        )


def test_interval_overlap_join_matches_naive_theta(spark):
    from cnics_to_fhir_spark.operators.intervals import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 250), (3, 300, 301), (4, 1000, 1200)],
        ["a_id", "a_start", "a_end"],
    )
    b = spark.createDataFrame(
        [(10, 90, 160), (11, 240, 330), (12, 299, 300), (13, 1100, 1101)],
        ["b_id", "b_start", "b_end"],
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, a_start="a_start", a_end="a_end",
            b_start="b_start", b_end="b_end", bucket_seconds=60,
        ).collect()
    }
    naive = {
        (r["a_id"], r["b_id"])
        for r in a.join(
            b, (a["a_start"] < b["b_end"]) & (b["b_start"] < a["a_end"])
        ).collect()
    }
    assert got == naive
    assert (1, 10) in got and (2, 11) in got and (3, 11) in got and (4, 13) in got
    assert (3, 12) not in got  # b ends exactly at a's start: half-open, no overlap


def test_interval_overlap_join_no_nested_loop(spark):
    from cnics_to_fhir_spark.operators.intervals import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 10)], ["a_id", "a_start", "a_end"])
    b = spark.createDataFrame([(2, 5, 15)], ["b_id", "b_start", "b_end"])
    plan = (
        interval_overlap_join(
            a, b, a_start="a_start", a_end="a_end",
            b_start="b_start", b_end="b_end", bucket_seconds=10,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_overlap_join_rejects_outer(spark):
    from cnics_to_fhir_spark.operators.intervals import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 10)], ["a_id", "a_start", "a_end"])
    b = spark.createDataFrame([(2, 5, 15)], ["b_id", "b_start", "b_end"])
    # Bucket replication would duplicate null-extended rows under any
    # non-inner join (one per replica of an unmatched interval), so the
    # operator refuses rather than silently over-counting.
    for how in ("left", "right", "outer", "full"):
        with pytest.raises(ValueError, match="inner"):
            interval_overlap_join(
                a, b, a_start="a_start", a_end="a_end",
                b_start="b_start", b_end="b_end", bucket_seconds=10, how=how,
            )


def test_point_in_interval_join_left_exact_and_outer_rejected(spark, frames):
    points, intervals = frames
    left = point_in_interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e",
        bucket_seconds=600, how="left",
    )
    # Points are never replicated, so left-outer is exact: every pid
    # appears, unmatched ones exactly once with a null interval id.
    rows = left.collect()
    matched = expected_pairs(points, intervals)
    got_matched = sorted((r.pid, r.iid) for r in rows if r.iid is not None)
    assert got_matched == matched
    unmatched = [r.pid for r in rows if r.iid is None]
    all_pids = {r.pid for r in points.collect()}
    assert sorted(unmatched) == sorted(all_pids - {p for p, _ in matched})
    for how in ("right", "outer", "full"):
        with pytest.raises(ValueError, match="inner"):
            point_in_interval_join(
                points, intervals, point_col="p", start_col="s", end_col="e",
                bucket_seconds=600, how=how,
            )
