"""Cogrouped-map positional diff (operators/cogroup.py)."""

from __future__ import annotations

from cnics_to_fhir_spark.operators.cogroup import positional_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, ord long, val double")


def test_positional_diff_all_statuses(spark):
    a = _snap(spark, [(1, 10, 5.0), (1, 20, 6.0), (1, 30, 7.0), (2, 10, 1.0)])
    b = _snap(spark, [(1, 10, 5.0), (1, 20, 9.0), (3, 10, 2.0)])
    out = positional_diff(a, b, "k", "ord", "val").collect()
    got = {(r["key"], r["pos"]): (r["status"], r["value_a"], r["value_b"]) for r in out}
    assert got == {
        (1, 1): ("match", 5.0, 5.0),
        (1, 2): ("differ", 6.0, 9.0),
        (1, 3): ("only_a", 7.0, None),
        (2, 1): ("only_a", 1.0, None),
        (3, 1): ("only_b", None, 2.0),
    }


def test_positional_diff_pairs_by_order_not_input_order(spark):
    # same rows, scrambled input order: pairing must follow the order column
    a = _snap(spark, [(1, 30, 3.0), (1, 10, 1.0), (1, 20, 2.0)])
    b = _snap(spark, [(1, 20, 2.0), (1, 30, 9.9), (1, 10, 1.0)])
    out = {r["pos"]: r["status"] for r in positional_diff(a, b, "k", "ord", "val").collect()}
    assert out == {1: "match", 2: "match", 3: "differ"}
