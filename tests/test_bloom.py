"""Bloom-filter semi-join reduction (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators.bloom import (
    bloom_probe,
    bloom_semi_join,
    build_bloom,
)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    bitmap = build_bloom(keys, "k", m_bits=1 << 12, k=3)
    hits = keys.filter(bloom_probe(F.col("k"), bitmap, 1 << 12, k=3)).count()
    assert hits == 200  # every build key must probe positive


def test_bloom_prunes_non_members(spark):
    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    bitmap = build_bloom(keys, "k", m_bits=1 << 16, k=3)
    probe = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    survivors = probe.filter(bloom_probe(F.col("k"), bitmap, 1 << 16, k=3)).count()
    # 50 keys × 3 bits in 65536 → FP rate ≈ (150/65536)^3 ≈ 1e-8; a handful
    # of survivors out of 10k non-members would already mean a broken build.
    assert survivors < 10


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact = spark.range(0, 1000).select(
        F.col("id").alias("fk"), (F.col("id") % 7).alias("payload")
    )
    dim = spark.range(0, 1000, 13).select(F.col("id").alias("dk"))
    via_bloom = bloom_semi_join(fact, dim, "fk", "dk", m_bits=1 << 12)
    plain = fact.join(dim.withColumnRenamed("dk", "fk"), on="fk", how="left_semi")
    assert sorted(r["fk"] for r in via_bloom.collect()) == sorted(
        r["fk"] for r in plain.collect()
    )


def test_bloom_semi_join_dedups_build_side(spark):
    # duplicate dim keys must not duplicate fact rows (semi-join semantics)
    fact = spark.createDataFrame([(1,), (2,), (3,)], "fk long")
    dim = spark.createDataFrame([(1,), (1,), (3,)], "dk long")
    out = bloom_semi_join(fact, dim, "fk", "dk")
    assert sorted(r["fk"] for r in out.collect()) == [1, 3]


def test_bloom_probe_lit_fallback_matches_sql_literal(spark, monkeypatch):
    """Above BLOOM_SQL_LITERAL_MAX_WORDS the F.lit bitmap path must probe
    identically to the single-parse SQL literal path (ADVICE r12: huge
    m_bits would build multi-MB SQL text)."""
    from cnics_to_fhir_spark.operators import bloom

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    bitmap = build_bloom(keys, "k", m_bits=1 << 12, k=3)
    probe = spark.range(0, 4000).select(F.col("id").alias("k"))
    via_sql = sorted(
        r["k"] for r in probe.filter(bloom_probe(F.col("k"), bitmap, 1 << 12, k=3)).collect()
    )
    monkeypatch.setattr(bloom, "BLOOM_SQL_LITERAL_MAX_WORDS", 0)
    via_lit = sorted(
        r["k"] for r in probe.filter(bloom_probe(F.col("k"), bitmap, 1 << 12, k=3)).collect()
    )
    assert via_sql == via_lit


def test_sql_double_non_finite_literals_parse(spark):
    """sql_double must render NaN/±Inf as parseable SQL (ADVICE r12:
    repr() yields 'nanD', which the parser rejects)."""
    from pyspark.sql import functions as F2

    from cnics_to_fhir_spark.operators.similarity import sql_double

    row = spark.range(1).select(
        F2.expr(sql_double(float("nan"))).alias("n"),
        F2.expr(sql_double(float("inf"))).alias("p"),
        F2.expr(sql_double(float("-inf"))).alias("m"),
        F2.expr(sql_double(1.5)).alias("f"),
    ).collect()[0]
    assert row["n"] != row["n"] and row["p"] == float("inf")
    assert row["m"] == float("-inf") and row["f"] == 1.5
