"""Incremental reconciliation — the batch snapshot-diff under foreachBatch.

The reference achieves incrementality by re-running the whole snapshot
reconciliation each run (cnics_to_fhir.py:249-928). Because the engine's
reconciliation is expressed as ``current × existing → action plan``
(operators/merge.py), the SAME code runs in Structured Streaming: each
micro-batch of changed current-state rows is diffed against a snapshot
provider and handed to any sink callback (the HTTP writer in production,
a collector in tests).

State notes for scale: the diff itself is stateless per batch (the snapshot
provider is the state); watermarking/dedup of the change stream happens
upstream with ``withWatermark`` + ``dropDuplicates`` on the business key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from cnics_to_fhir_spark.operators.merge import merge_plan


def reconcile_stream(
    current_stream: DataFrame,
    snapshot_provider: Callable[[], DataFrame],
    sink: Callable[[DataFrame, int], None],
    key: str = "key",
    checkpoint_dir: str | None = None,
    payload_cols: list[str] | None = None,
):
    """Wire a streaming DataFrame of current-state rows into per-batch
    MERGE plans. Returns the StreamingQuery (caller stops it).

    ``snapshot_provider`` is called per batch so it can read the writer's
    own previous output (the read-your-writes requirement of SURVEY §7.4).
    """

    def for_each_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        plan = merge_plan(
            batch_df, snapshot_provider(), key=key, payload_cols=payload_cols
        )
        sink(plan, epoch_id)

    writer = current_stream.writeStream.foreachBatch(for_each_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
