"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


def test_queries_oracle_consistency(spark):
    mod = _load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key has a query; rows-only ops are the xxhash64-based ones
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "dd03_minhash_lsh",
        "dd04_simhash_near_dup",
        "ann02_lsh_topk",
        "a10_approx_distinct",
        "a11_approx_percentiles",
        "a14_hll_rollup",
        "ann11_mmr_diversified",  # greedy MMR: not SQL-expressible; pytest-pinned
    }


def test_approx_distinct_error_bound(spark):
    """a10 is rows-only for the driver; pin HLL relative error here."""
    from cnics_to_fhir_spark.plans import catalog

    sf = "/root/testdata/sf0.01"
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in catalog()["a10_approx_distinct"].spark(spark, sf).collect()
    }
    from cnics_to_fhir_spark.sources.tables import read_table
    from pyspark.sql import functions as F

    exact = {
        r["l_returnflag"]: r["n"]
        for r in read_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_all_queries_run_at_sf0001(spark):
    mod = _load_entry()
    for name, fn in mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_approx_percentile_error_bound(spark):
    """a11 is rows-only for the driver; pin sketch error against the exact
    interpolated percentiles (a09's method) at sf0.01."""
    from pyspark.sql import functions as F

    from cnics_to_fhir_spark.plans import catalog
    from cnics_to_fhir_spark.sources.tables import read_table

    sf = "/root/testdata/sf0.01"
    approx = {
        r["l_returnflag"]: [r["p50"], r["p90"], r["p99"]]
        for r in catalog()["a11_approx_percentiles"].spark(spark, sf).collect()
    }
    exact = {
        r["l_returnflag"]: r["pcts"]
        for r in read_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("pcts"))
        .collect()
    }
    for k, est in approx.items():
        for e, x in zip(est, exact[k]):
            assert abs(e - x) / x < 0.01, (k, e, x)
