"""Streaming window aggregations with watermark-bounded state.

The batch tumbling-window aggregation (operators/events_windows.py) runs
unchanged under ``readStream``; what streaming adds is the watermark: state
for a window is kept only until the event-time watermark passes its end,
so the operator's memory is O(active windows), not O(stream length) — the
property that lets the same plan run forever on an unbounded source.

Late rows (older than watermark) are dropped by the engine in append mode;
tests/test_streaming.py pins that behavior with a two-batch file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_stream(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling (or, with ``slide``, sliding) window counts/sums
    per event_type for an unbounded event stream. Output (append mode):
    finalized windows only. A sliding window multiplies live state by
    width/slide — the watermark bound applies per overlapping window."""
    win = F.window(ts_col, width, slide) if slide else F.window(ts_col, width)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, table_name: str, checkpoint_dir: str):
    """Wire a streaming aggregation to an in-memory sink (tests/demos).
    Append mode — only watermark-finalized windows are emitted."""
    return (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
