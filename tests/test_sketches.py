"""HLL sketch rollup (operators/sketches.py): mergeability + error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators.sketches import hll_rollup, hll_sketches
from cnics_to_fhir_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_rollup_equals_direct_sketch(spark):
    """Union-of-fine-sketches must give the SAME estimate as sketching the
    coarse group directly — register-max merging is order-insensitive, so
    the two merge trees are equivalent. This is the property that makes
    persisted sketch tables trustworthy."""
    ev = read_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    fine = hll_sketches(ev, ["day", "event_type"], "user_id")
    rolled = hll_rollup(fine, ["day"])

    direct = (
        ev.groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("long")
            .alias("approx_distinct")
        )
    )
    got = {r["day"]: r["approx_distinct"] for r in rolled.collect()}
    want = {r["day"]: r["approx_distinct"] for r in direct.collect()}
    assert got == want


def test_rollup_error_bound_and_counts(spark):
    """Estimates land within 5% of exact distincts at lgK=12 on every day,
    and n_rows is exact (it sums, not sketches)."""
    ev = read_table(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    rolled = hll_rollup(hll_sketches(ev, ["day", "event_type"], "user_id"), ["day"])
    exact = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        F.count(F.lit(1)).alias("exact_rows"),
    )
    joined = rolled.join(exact, "day").collect()
    assert len(joined) > 0
    for r in joined:
        rel_err = abs(r["approx_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel_err < 0.05, (r["day"], r["approx_distinct"], r["exact_distinct"])
        assert r["n_rows"] == r["exact_rows"]


def test_rollup_chains_to_global(spark):
    """hour→day→global chaining: a rollup of a rollup is still a valid
    sketch table, and the global estimate matches sketching all rows."""
    ev = read_table(spark, SF_DIR, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    ).withColumn("day", F.to_date("ts"))
    fine = hll_sketches(ev, ["day", "hour"], "user_id")
    # keep the intermediate as a sketch table (re-aggregate, don't estimate)
    daily = fine.groupBy("day").agg(
        F.hll_union_agg("sketch").alias("sketch"), F.sum("n_rows").alias("n_rows")
    )
    total = hll_rollup(daily, []).collect()[0]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
        .cast("long")
        .alias("d")
    ).collect()[0]["d"]
    assert total["approx_distinct"] == direct
