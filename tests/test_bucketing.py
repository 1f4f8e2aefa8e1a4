"""Bucketing: pre-shuffled storage makes repeated big-big joins shuffle-free.

At 100 TB the lineitem⋈orders join shuffles both tables every run; bucketing
both by the join key at write time moves that cost into the (one-time) write.
This test pins the property the strategy depends on: a join of two tables
bucketed on the join key compiles to a plan with NO Exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path_factory):
    # session warehouse dir is fixed at session start; use a unique db
    db = "bucketing_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(f"{warehouse}.orders_b"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(f"{warehouse}.lineitem_b"))

    ob = spark.table(f"{warehouse}.orders_b")
    lb = spark.table(f"{warehouse}.lineitem_b")

    # disable auto-broadcast so the plan shows what happens when BOTH sides
    # are big (the 100 TB case a local fixture can't reproduce by size)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"]).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed storage feeds the join directly — no Exchange on either side
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0

        # sanity: the same join on raw (unbucketed) frames DOES shuffle
        raw = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in raw_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
