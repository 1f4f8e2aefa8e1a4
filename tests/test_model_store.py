"""Trained-artifact store: round-trips that preserve SERVING behavior
(loaded centroids assign identically; loaded merges are byte-equal), and
loud failure on every corruption class the manifest guards."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators import clustering, model_store, textanalysis
from cnics_to_fhir_spark.operators.similarity import ivf_topk_multiprobe


def _emb(spark, n=24, dim=4):
    import random

    rnd = random.Random(5)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_centroids_round_trip_preserves_serving(spark, tmp_path):
    emb = _emb(spark)
    assigned, centroids = clustering.kmeans_train(spark, emb, k=3, iters=2)
    path = str(tmp_path / "ivf_centroids" / "v1")
    model_store.save_centroids(spark, centroids, path, params={"k": 3, "iters": 2})
    loaded = model_store.load_centroids(spark, path)
    # load_centroids returns cid-sorted (a canonical order); the trainer's
    # list is in aggregation-collect order — same SET either way
    assert loaded == sorted((cid, list(cv)) for cid, cv in centroids)

    # serving equivalence: a multiprobe search against the LOADED matrix
    # returns exactly what the freshly-trained matrix returns
    indexed = assigned.join(emb, "vec_id").select(
        "vec_id", "embedding", F.col("cluster").alias("cell")
    )
    q = indexed.filter(F.col("vec_id") < 3)
    fresh = sorted(
        map(tuple, ivf_topk_multiprobe(indexed, q, centroids, nprobe=2, k=3).collect())
    )
    served = sorted(
        map(tuple, ivf_topk_multiprobe(indexed, q, loaded, nprobe=2, k=3).collect())
    )
    assert fresh == served


def test_merge_table_round_trip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = textanalysis.bpe_learn_merges(docs, n_merges=3)
    path = str(tmp_path / "bpe" / "v1")
    manifest = model_store.save_model(merges, path, kind="bpe_merges", params={"n": 3})
    assert manifest["n_rows"] == 3
    loaded, m2 = model_store.load_model(spark, path, expect_kind="bpe_merges")
    assert m2 == manifest
    assert sorted(map(tuple, loaded.collect())) == sorted(map(tuple, merges.collect()))


def test_kind_mismatch_and_overwrite_guard(spark, tmp_path):
    df = spark.createDataFrame([(0, [0.0])], "cid int, cv array<double>")
    path = str(tmp_path / "m")
    model_store.save_model(df, path, kind="kmeans_centroids")
    with pytest.raises(ValueError, match="kind mismatch"):
        model_store.load_model(spark, path, expect_kind="bpe_merges")
    with pytest.raises(FileExistsError):
        model_store.save_model(df, path, kind="kmeans_centroids")
    model_store.save_model(df, path, kind="kmeans_centroids", overwrite=True)


def test_tampered_data_fails_checksum(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "m")
    model_store.save_model(df, path, kind="table")
    # overwrite the data with same-shape different values, manifest untouched
    df.withColumn("v", F.col("v") + 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "data")
    )
    with pytest.raises(ValueError, match="checksum mismatch"):
        model_store.load_model(spark, path)


def test_truncated_data_fails_row_count(spark, tmp_path):
    df = spark.range(10).select(F.col("id"))
    path = str(tmp_path / "m")
    model_store.save_model(df, path, kind="table")
    df.limit(4).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "data"))
    with pytest.raises(ValueError, match="row-count mismatch"):
        model_store.load_model(spark, path)
