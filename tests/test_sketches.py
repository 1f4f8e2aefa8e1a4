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


def test_quantile_sketch_rank_error_bound_and_determinism(spark):
    """The summary's answer must sit within n/delta ranks of the exact
    percentile target, and be identical across repartitionings (the
    mergeable-sketch property percentile_approx does NOT have)."""
    from cnics_to_fhir_spark.operators.sketches import quantile_summary_sketch

    ev = read_table(spark, SF_DIR, "events")
    out = quantile_summary_sketch(
        ev, value_col="value", group_col="event_type", key_col="event_id",
        pcts=(50, 90, 99), n_salts=8, delta=64,
    )
    rows = out.collect()
    values = {r["event_type"]: dict() for r in rows}
    for r in rows:
        values[r["event_type"]][r["pct"]] = (r["value"], r["n_rows"])

    exact = {
        (r["event_type"],): sorted(
            x["value"] for x in ev.filter(F.col("event_type") == r["event_type"])
            .select("value").collect()
        )
        for r in ev.select("event_type").distinct().collect()
    }
    for (etype,), vals in exact.items():
        n = len(vals)
        assert values[etype][50][1] == n
        for pct, (got, _) in values[etype].items():
            target = -(-pct * n // 100)  # ceil
            # true rank range of the returned value in the sorted data
            import bisect

            lo = bisect.bisect_left(vals, got) + 1
            hi = bisect.bisect_right(vals, got)
            err_bound = n // 64 + 8  # n/delta + one per shard (ceil slack)
            assert lo - err_bound <= target <= hi + err_bound, (
                etype, pct, got, target, lo, hi)

    rep = quantile_summary_sketch(
        ev.repartition(7, "user_id"), value_col="value", group_col="event_type",
        key_col="event_id", pcts=(50, 90, 99), n_salts=8, delta=64,
    ).collect()
    assert sorted(map(tuple, rep)) == sorted(map(tuple, rows))
