"""Salted-join rewrite contract (operators/skew.py): row-identical to the
plain equi-join for inner and left joins, including unmatched-left rows
and salt-bucket edge cases (B=1 degenerates to the plain join)."""

from __future__ import annotations

import pytest

from cnics_to_fhir_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def frames(spark):
    # 'hot' carries 200 of 203 rows — the skew shape; 'orphan' has no dim row.
    big = spark.createDataFrame(
        [(f"r{i}", "hot", float(i)) for i in range(200)]
        + [("x1", "cold", 1.0), ("x2", "cool", 2.0), ("x3", "orphan", 3.0)],
        "row_id string, k string, v double",
    )
    small = spark.createDataFrame(
        [("hot", 10), ("cold", 20), ("cool", 30), ("unused", 40)],
        "k string, weight int",
    )
    return big, small


def pairs(df):
    return sorted((r.row_id, r.k, r.v, r.weight) for r in df.collect())


@pytest.mark.parametrize("buckets", [1, 8])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_equals_plain(spark, frames, how, buckets):
    big, small = frames
    plain = big.join(small, on=["k"], how=how)
    salted = salted_join(
        big, small, ["k"], salt_from=["row_id"], buckets=buckets, how=how
    )
    assert pairs(salted) == pairs(plain)
    assert sorted(salted.columns) == sorted(plain.columns)  # salt dropped


def test_rejects_zero_buckets(spark, frames):
    big, small = frames
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], salt_from=["row_id"], buckets=0)
