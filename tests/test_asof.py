"""As-of join semantics on hand-checkable fixtures (operators/asof.py);
the testdata-scale equivalence vs DuckDB ASOF JOIN runs in the oracle
(aj01_asof_join)."""

from __future__ import annotations

from datetime import datetime

from cnics_to_fhir_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # after two views → latest wins
            (2, 100, _ts("2024-01-01 08:00:00")),  # before any view → nulls
            (3, 100, _ts("2024-01-01 09:30:00")),  # exactly at a view ts → inclusive
            (4, 200, _ts("2024-01-01 10:00:00")),  # other key, isolated
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 09:00:00"), 1.0),
            (100, _ts("2024-01-01 09:30:00"), 2.0),
            (200, _ts("2024-01-01 09:59:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r["event_id"]: r for r in asof_join(left, right).collect()}
    assert len(out) == 4
    assert out[1]["matched_value"] == 2.0
    assert out[2]["matched_ts"] is None and out[2]["matched_value"] is None
    assert out[3]["matched_value"] == 2.0  # ts == view ts counts ("<=")
    assert out[4]["matched_value"] == 9.0  # keys don't leak across users


def test_asof_join_forward_semantics(spark):
    from cnics_to_fhir_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 09:15:00")),  # next view at 09:30
            (2, 100, _ts("2024-01-01 10:00:00")),  # after last view → nulls
            (3, 100, _ts("2024-01-01 09:30:00")),  # exactly at a view ts → inclusive
            (4, 200, _ts("2024-01-01 09:00:00")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 09:00:00"), 1.0),
            (100, _ts("2024-01-01 09:30:00"), 2.0),
            (200, _ts("2024-01-01 09:59:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r["event_id"]: r for r in asof_join_forward(left, right).collect()}
    assert len(out) == 4
    assert out[1]["next_value"] == 2.0
    assert out[2]["next_ts"] is None and out[2]["next_value"] is None
    assert out[3]["next_value"] == 2.0  # ts == view ts counts (">=")
    assert out[4]["next_value"] == 9.0


def test_asof_join_duplicate_right_ts_is_deterministic(spark):
    """Multiple right rows with identical (key, ts): both directions must
    pick the struct-min payload (the smallest value here), matching the
    MIN()-reduced oracle — not an arbitrary window-order row."""
    from cnics_to_fhir_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    dup = [
        (100, _ts("2024-01-01 09:30:00"), v) for v in (7.0, 3.0, 5.0)
    ] + [(100, _ts("2024-01-01 10:30:00"), v) for v in (9.0, 4.0, 6.0)]
    for _ in range(3):  # repeat: nondeterminism would flake across runs
        right = spark.createDataFrame(
            dup, "user_id long, ts timestamp, value double"
        ).repartition(4)
        back = asof_join(left, right).collect()[0]
        fwd = asof_join_forward(left, right).collect()[0]
        assert back["matched_value"] == 3.0
        assert fwd["next_value"] == 4.0


def test_asof_tolerance_nulls_stale_matches(spark):
    from cnics_to_fhir_spark.operators.asof import asof_join_tolerance

    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # view 5 min old → kept
            (2, 100, _ts("2024-01-01 11:00:00")),  # latest view 65 min old → NULL
            (3, 100, _ts("2024-01-01 09:55:00")),  # exactly at tolerance → kept
            (4, 200, _ts("2024-01-01 10:00:00")),  # no views at all → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01 09:55:00"), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join_tolerance(
            left, right, tolerance_seconds=300
        ).collect()
    }
    assert out[1]["matched_value"] == 7.0
    assert out[2]["matched_value"] is None and out[2]["matched_ts"] is None
    assert out[3]["matched_value"] == 7.0  # age == tolerance is inside ("<=")
    assert out[4]["matched_value"] is None
