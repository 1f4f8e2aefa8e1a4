"""MERGE INTO a hive-partitioned parquet table — SURVEY §7.3's second named
future-work item ("Delta/`MERGE INTO` as an alternative reconciliation
sink"), built copy-on-write on plain parquet.

The reconciliation engine produces an action plan (operators/merge.merge_plan:
key, action ∈ insert/update/delete, payload); the HTTP writer applies it to
a FHIR store.  This module applies the SAME plan to a parquet TABLE, the
shape a lakehouse lands on:

- **Copy-on-write, partition-scoped**: only partitions that contain an
  affected key are rewritten; every other partition's files are not read,
  not rewritten, not even listed — at 100 TB with daily partitions and a
  trickle of changes, a merge touches days, not the table.  The test pins
  this physically (untouched partitions keep byte-identical file lists and
  mtimes).
- **Crash-safe swaps**: each rewritten partition lands via the
  rename-aside swap (maintenance._swap_aside) and inherits its recovery
  story (recover_compaction_leftovers rolls back or finishes interrupted
  swaps).
- **Same honesty rules as the HTTP path**: unknown action labels fail
  loudly; returned counts state exactly what was applied and what was
  skipped (a delete/update whose key is absent from the table is a
  ``noop_missing_key``, reported, never silently dropped).

NOT a transaction log: concurrent WRITERS to the same partition race, as
everywhere else in the plain-parquet layer — the module docstring of
load/maintenance.py states the same boundary.  Readers are safe up to the
single metadata-op window of each partition swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators.merge import (
    ACTION_DELETE,
    ACTION_INSERT,
    ACTION_UPDATE,
)

_KNOWN = {ACTION_INSERT, ACTION_UPDATE, ACTION_DELETE}


def merge_into_table(
    spark: SparkSession,
    table: str,
    plan: DataFrame,
    key_col: str,
    partition_col: str,
    files_per_partition: int | None = None,
) -> dict[str, int]:
    """Apply an action plan to the partitioned parquet table at ``table``.

    ``plan`` must carry ``key_col``, an ``action`` column, ``partition_col``
    (the partition every action row targets — for updates/deletes the
    partition the key lives in), and the payload columns of the table.
    Returns counts: inserted / updated / deleted / noop_missing_key /
    partitions_rewritten.

    ``files_per_partition`` coalesces each rewritten partition to that many
    files — without it the rewrite inherits the merge joins' shuffle
    partitioning (32 task-files per partition dir at defaults), the exact
    small-file accretion load/maintenance.py exists to undo.  Size it to
    partition_bytes / target_file_bytes at scale; leave None to let Spark
    decide (and schedule compaction instead).
    """
    bad = [
        r["action"]
        for r in plan.select("action").distinct().collect()
        if r["action"] not in _KNOWN
    ]
    if bad:
        raise ValueError(f"merge_into_table: unknown action labels {bad!r}")

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(table).getFileSystem(conf)

    from cnics_to_fhir_spark.load.maintenance import _swap_aside

    table = table.rstrip("/")
    payload_cols = [
        c for c in plan.columns if c not in (key_col, "action", "id", partition_col)
    ]
    parts = [
        r["p"]
        for r in plan.select(F.col(partition_col).alias("p")).distinct().collect()
    ]
    counts = {
        "inserted": 0,
        "updated": 0,
        "deleted": 0,
        "noop_missing_key": 0,
        "partitions_rewritten": 0,
    }
    for val in sorted(parts):
        sub = f"{table}/{partition_col}={val}"
        p_sub = jvm.org.apache.hadoop.fs.Path(sub)
        part_plan = plan.filter(F.col(partition_col) == val).localCheckpoint()
        existing = (
            spark.read.parquet(sub).drop(partition_col)
            if fs.exists(p_sub)
            else spark.createDataFrame(
                [], plan.select(key_col, *payload_cols).schema
            )
        )
        # classify against what the table ACTUALLY holds — an update for an
        # absent key (or delete of one) is reported, not invented/ignored.
        # Everything is keyed joins (semi/anti): no key list ever rides the
        # driver, so a million-row delta partition costs a shuffle, not RAM
        present = existing.select(key_col).distinct()
        touched = part_plan.filter(F.col("action").isin(ACTION_UPDATE, ACTION_DELETE))
        n_update = (
            part_plan.filter(F.col("action") == ACTION_UPDATE)
            .join(present, key_col, "left_semi")
            .count()
        )
        n_delete = (
            part_plan.filter(F.col("action") == ACTION_DELETE)
            .join(present, key_col, "left_semi")
            .count()
        )
        n_missing = touched.count() - n_update - n_delete
        n_insert = part_plan.filter(F.col("action") == ACTION_INSERT).count()

        replaced_keys = touched.select(key_col).distinct()
        survivors = existing.join(replaced_keys, key_col, "left_anti")
        updates_present = (
            part_plan.filter(F.col("action") == ACTION_UPDATE)
            .join(present, key_col, "left_semi")
        )
        incoming = (
            part_plan.filter(F.col("action") == ACTION_INSERT)
            .unionByName(updates_present)
            .select(key_col, *payload_cols)
        )
        merged = survivors.unionByName(incoming)

        scratch = f"{table}__merging_{partition_col}={val}"
        if files_per_partition is not None:
            merged = merged.coalesce(files_per_partition)
        merged.write.mode("overwrite").parquet(scratch)
        fs.delete(jvm.org.apache.hadoop.fs.Path(scratch + "/_SUCCESS"), False)
        _swap_aside(fs, jvm, scratch, sub, f"{table}__prev_{partition_col}={val}")

        counts["inserted"] += n_insert
        counts["updated"] += n_update
        counts["deleted"] += n_delete
        counts["noop_missing_key"] += n_missing
        counts["partitions_rewritten"] += 1
    return counts
