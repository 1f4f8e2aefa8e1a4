"""Expectation-suite semantics (operators/quality.py) on hand fixtures;
the testdata-scale hash equivalence runs in the oracle
(dq05_expectation_suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators import quality


def _by_check(df):
    return {r["check"]: r for r in df.collect()}


def test_expect_rows_single_scan_counts_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 5.0)], "id long, v double"
    )
    out = _by_check(
        quality.expect_rows(
            df,
            {
                "v_positive": ~(F.col("v") > 0),   # NULL → violation
                "v_not_null": F.col("v").isNull(),
                "id_positive": ~(F.col("id") > 0),
            },
        )
    )
    assert (out["v_positive"]["n_rows"], out["v_positive"]["n_violations"]) == (4, 2)
    assert not out["v_positive"]["passed"]
    assert out["v_not_null"]["n_violations"] == 1
    assert out["id_positive"]["n_violations"] == 0 and out["id_positive"]["passed"]


def test_expect_unique_counts_rows_beyond_first(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k long"
    )
    row = quality.expect_unique(df, ["k"]).collect()[0]
    assert (row["n_rows"], row["n_violations"], row["passed"]) == (5, 2, False)


def test_expect_foreign_key_orphans_include_null_keys(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, ref long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "k long")
    row = quality.expect_foreign_key(child, parent, "ref", "k").collect()[0]
    assert (row["n_rows"], row["n_violations"], row["passed"]) == (4, 2, False)


def test_suite_unions_reports(spark):
    df = spark.createDataFrame([(1,)], "k long")
    suite = quality.expectation_suite(
        quality.expect_unique(df, ["k"]),
        quality.expect_rows(df, {"k_pos": ~(F.col("k") > 0)}),
    )
    assert {r["check"] for r in suite.collect()} == {"unique(k)", "k_pos"}
    assert all(r["passed"] for r in suite.collect())


def test_expect_unique_on_empty_table_passes(spark):
    df = spark.createDataFrame([], "k long")
    row = quality.expect_unique(df, ["k"]).collect()[0]
    assert (row["n_rows"], row["n_violations"], row["passed"]) == (0, 0, True)


def test_expect_rows_on_empty_table_passes(spark):
    df = spark.createDataFrame([], "v double")
    out = _by_check(quality.expect_rows(df, {"v_pos": ~(F.col("v") > 0)}))
    assert (out["v_pos"]["n_rows"], out["v_pos"]["n_violations"], out["v_pos"]["passed"]) == (0, 0, True)
