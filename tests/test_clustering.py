"""K-means operator invariants (operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators.clustering import kmeans_assign
from cnics_to_fhir_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_kmeans_assigns_every_vector_once(spark):
    emb = read_table(spark, SF, "embeddings")
    out = kmeans_assign(spark, emb, k=4, iters=2)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    assert out.select("cluster").distinct().count() <= 4


def test_kmeans_inertia_non_increasing(spark):
    emb = read_table(spark, SF, "embeddings")

    def inertia(iters):
        return (
            kmeans_assign(spark, emb, k=4, iters=iters)
            .agg(F.sum("dist").alias("s"))
            .collect()[0]["s"]
        )

    assert inertia(2) <= inertia(1) + 1e-6  # Lloyd monotonicity


def test_kmeans_deterministic(spark):
    emb = read_table(spark, SF, "embeddings")
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assign(spark, emb, k=4, iters=2).collect()}
    b = {r["vec_id"]: r["cluster"] for r in kmeans_assign(spark, emb, k=4, iters=2).collect()}
    assert a == b


def test_assign_broadcast_fallback_matches_inline(spark, monkeypatch):
    """Above ASSIGN_INLINE_MAX_LITERALS the broadcast-join argmin must be
    value-identical to the inlined projection (same distances, same
    (dist, cid) tie-break) — the plan-size guard of VERDICT r12 #3."""
    from cnics_to_fhir_spark.operators import clustering

    emb = read_table(spark, SF, "embeddings")
    inline = {
        (r["vec_id"]): (r["cluster"], r["dist"])
        for r in kmeans_assign(spark, emb, k=4, iters=2).collect()
    }
    monkeypatch.setattr(clustering, "ASSIGN_INLINE_MAX_LITERALS", 0)
    fallback = {
        (r["vec_id"]): (r["cluster"], r["dist"])
        for r in kmeans_assign(spark, emb, k=4, iters=2).collect()
    }
    assert inline == fallback
