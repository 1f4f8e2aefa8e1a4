"""Streaming exact dedup on ingest: the streaming form of
``operators/dedup.exact_dedup_plan`` for a continuously-arriving corpus.

``dropDuplicatesWithinWatermark`` keys state on the dedup key and expires
it once the event-time watermark passes, so state stays bounded on an
unbounded stream — the property that makes dedup-on-ingest viable at
100 TB/day, where an unbounded ``dropDuplicates`` would accrete every key
ever seen. Near-dup (MinHash) stays a batch/compaction concern; exact
fingerprint dedup is what belongs on the ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attach the batch-identical md5 fingerprint (normalized text) and drop
    duplicate fingerprints whose event times fall within ``watermark``."""
    from cnics_to_fhir_spark.operators.textanalysis import fingerprint

    return (
        stream.withColumn("fingerprint", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def run_dedup_to_memory_sink(dedup: DataFrame, name: str, checkpoint_dir: str):
    """Append-mode memory sink for tests; real deployments write parquet/Delta."""
    return (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
