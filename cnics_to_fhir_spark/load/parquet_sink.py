"""Partitioned parquet sink: the storage-layout half of the scale story.

`hive-partition by the pruning key, sort within files by the probe key` is
the layout contract the read side depends on: partition directories give
Catalyst `PartitionFilters` (entire directories skipped before any IO), and
the within-file sort gives parquet min/max row-group stats their
selectivity for `PushedFilters`. At 100 TB the difference between a pruned
and an unpruned scan is the job.

Use `partition_cols` for low-cardinality routing keys (site, shard, date);
never for high-cardinality keys (patient id) — millions of tiny directories
kill the driver's file listing. High-cardinality co-location belongs to
`bucketBy` (see tests/test_bucketing.py for the bucketed-join strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write hive-partitioned parquet, optionally sorted within partitions.

    ``repartition(partition_cols)`` first, so each task owns whole hive
    partitions and writes one file per partition instead of
    tasks × partitions small files — the small-file problem is a read-side
    scale killer. ``maxRecordsPerFile`` re-splits oversized partitions.
    """
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned dataset; filters on partition columns become
    PartitionFilters (directory skip), filters on sort columns hit row-group
    min/max stats via PushedFilters."""
    return spark.read.parquet(path)
