"""Structured-Streaming reconciliation: a file-source stream of current rows
diffed per micro-batch against a snapshot via foreachBatch — the batch MERGE
code running unchanged in streaming mode (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest

from cnics_to_fhir_spark.streaming.reconcile import reconcile_stream


def test_reconcile_stream_emits_plans(spark, tmp_path):
    src = tmp_path / "stream-src"
    src.mkdir()
    chk = tmp_path / "chk"

    spark.createDataFrame(
        [("k1", "b1"), ("k2", "b2")], "key string, body string"
    ).write.parquet(str(src / "batch0"))

    stream = (
        spark.readStream.schema("key string, body string").parquet(str(src) + "/*")
    )
    snapshot = spark.createDataFrame([("k2", "srv-2"), ("k3", "srv-3")], "key string, id string")

    collected: list[dict] = []

    def sink(plan, epoch_id):
        for r in plan.collect():
            collected.append(r.asDict())

    q = reconcile_stream(
        stream, lambda: snapshot, sink, key="key",
        checkpoint_dir=str(chk), payload_cols=["body"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    actions = {r["key"]: r["action"] for r in collected}
    assert actions == {"k1": "insert", "k2": "update", "k3": "delete"}
