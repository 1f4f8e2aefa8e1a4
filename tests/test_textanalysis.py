from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators import textanalysis as tx


def test_profile_basics(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "el perro de la casa y el gato")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in tx.profile(df).collect()}
    assert out[1]["n_tokens"] == 5
    assert out[1]["n_distinct_tokens"] == 4
    assert out[1]["lang_guess"] == "en"
    assert out[2]["lang_guess"] == "es"
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO WORLD ")],
        ["doc_id", "text"],
    )
    fps = [r["fp"] for r in df.select(tx.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_token_count_empty(spark):
    df = spark.createDataFrame([("",), ("one",)], ["text"])
    out = [r["n"] for r in df.select(tx.token_count(F.col("text")).alias("n")).collect()]
    assert out == [0, 1]


def test_lang_id_unknown(spark):
    df = spark.createDataFrame([("xyzzy plugh quux",)], ["text"])
    out = df.select(tx.lang_id(F.col("text")).alias("lg")).collect()
    assert out[0]["lg"] == "unk"
