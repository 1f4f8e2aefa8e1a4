"""Composed streaming curation vertical: ingest → exact dedup-on-ingest →
quality gate → per-batch MERGE reconciliation, chained in ONE streaming
query — each stage is unit-tested elsewhere (test_streaming.py); this
pins that the composition holds: dedup state spans micro-batches, the
gate runs on the deduped stream, and the reconciler sees only curated
rows. The same composition at 100 TB/day: file/Kafka source, bounded
dedup state via watermark, foreachBatch writing the action plan to the
store."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators.textanalysis import fingerprint, quality_score
from cnics_to_fhir_spark.streaming.dedup import fingerprint_dedup_stream
from cnics_to_fhir_spark.streaming.reconcile import reconcile_stream

GOOD_1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
GOOD_2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
JUNK = "a a a a"  # diversity 0.25, avg len 1 → gated


def test_streaming_curation_vertical(spark, tmp_path):
    src = tmp_path / "stream-src"
    src.mkdir()
    chk = tmp_path / "chk"

    wave1 = [
        ("doc1", "2024-01-01 10:00:00", GOOD_1),
        ("doc2", "2024-01-01 10:00:05", GOOD_1),  # duplicate content → suppressed
        ("doc3", "2024-01-01 10:00:10", JUNK),    # low quality → gated
    ]
    wave2 = [
        ("doc4", "2024-01-01 10:10:00", GOOD_1),  # dup across batches → suppressed
        ("doc5", "2024-01-01 10:10:05", GOOD_2),  # new content → insert
    ]

    def write_wave(rows, name):
        spark.createDataFrame(rows, "doc_key string, ts_s string, text string") \
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
            .coalesce(1).write.parquet(str(src / name))

    write_wave(wave1, "wave1")
    time.sleep(1.2)  # distinct mtimes so the file source takes wave1 first
    write_wave(wave2, "wave2")

    stream = (
        spark.readStream.schema("doc_key string, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )

    curated = fingerprint_dedup_stream(stream, ts_col="ts", text_col="text").filter(
        quality_score(F.col("text")) >= 0.5
    )

    # store snapshot: doc1's fingerprint already present (→ update), plus a
    # stale entry no stream row carries (→ delete, every batch)
    fp = spark.createDataFrame([(GOOD_1,)], "text string").select(
        fingerprint(F.col("text")).alias("key")
    ).collect()[0]["key"]
    snapshot = spark.createDataFrame(
        [(fp, "srv-1"), ("stale-fp", "srv-9")], "key string, id string"
    )

    epochs: dict[int, list[dict]] = {}

    def sink(plan, epoch_id):
        rows = [r.asDict() for r in plan.collect()]
        if rows:
            epochs[epoch_id] = rows

    # changed-rows batches (downstream of dedup): absence ≠ deletion, so
    # full_state=False — a batch carrying only doc5 must NOT delete doc1
    q = reconcile_stream(
        curated.select(F.col("fingerprint").alias("key"), "doc_key", "text"),
        lambda: snapshot,
        sink,
        key="key",
        checkpoint_dir=str(chk),
        payload_cols=["doc_key", "text"],
        full_state=False,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_rows = [r for rows in epochs.values() for r in rows]
    by_doc = {r["doc_key"]: r for r in all_rows if r["doc_key"] is not None}

    # doc1 survived dedup and matched the snapshot → update with server id
    assert by_doc["doc1"]["action"] == "update" and by_doc["doc1"]["id"] == "srv-1"
    # doc5's fresh content → insert
    assert by_doc["doc5"]["action"] == "insert" and by_doc["doc5"]["id"] is None
    # duplicates (doc2 same batch, doc4 across batches) and junk never reach
    # the reconciler — dedup state carried across micro-batches
    assert {"doc2", "doc3", "doc4"}.isdisjoint(by_doc)
    # CDC mode: no deletes derived from absence — not for the stale
    # snapshot entry, and crucially not for doc1's key in the doc5-only
    # batch (deriving deletes from a changed-rows batch would tear the
    # store down; that path is full_state=True, test_streaming.py)
    assert not [r for r in all_rows if r["action"] == "delete"]
    # two micro-batches actually happened (maxFilesPerTrigger=1)
    assert len(epochs) >= 2
