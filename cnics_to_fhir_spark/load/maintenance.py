"""Table maintenance: small-file compaction for parquet datasets.

Every long-running ingest (streaming micro-batches, per-site incremental
loads, the FHIR merge pipeline's daily deltas) accretes small files; at
100 TB the read-side cost is not the bytes but the FILE COUNT — driver-side
listing, one scan task per tiny file, and row groups too small for
min/max stats to prune.  Periodic compaction rewrites a table's data into
~target-sized files, which is exactly what `OPTIMIZE` does in
transactional table formats.  Plain parquet directories have no
transaction log, so the rewrite here is write-to-scratch + rename-aside
swap (old -> __prev, scratch -> path, delete __prev): a crash at any point
leaves every byte recoverable at path, __prev, or the scratch dir — nothing
is deleted until the new tree is live.  Safe for concurrent READERS up to
the instant between the two renames (both metadata ops); honestly NOT safe
against a concurrent WRITER — a production deployment puts a table format
(Iceberg/Delta) or a partition-level swap in front of this.

Planning reads ONLY file metadata (a Hadoop FileSystem listing — no data
IO), so `plan_compaction` is free to run every cycle and trigger the
rewrite only when the small-file fraction crosses a threshold.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    n_files: int
    total_bytes: int
    n_small_files: int  # files under half the target size
    target_files: int   # ceil(total_bytes / target_bytes), min 1
    worth_it: bool      # enough small files that a rewrite pays for itself


def _list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, length) for every data file under ``path``, via the Hadoop
    FileSystem API — works on local paths, HDFS, and object stores alike,
    and touches metadata only."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    base = fs.makeQualified(hpath).toString().rstrip("/") + "/"
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(base):] if full.startswith(base) else st.getPath().getName()
        # skip _SUCCESS, .crc sidecars, AND anything under a hidden
        # directory segment — a streaming file sink's _spark_metadata log
        # holds plainly-named files ("0", "1", …) that are not data.
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        out.append((full, int(st.getLen())))
    return out


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_small_fraction: float = 0.5,
) -> CompactionPlan:
    """Metadata-only compaction planning: how fragmented is the table and
    how many files SHOULD it have at ``target_bytes`` per file.  A rewrite
    is ``worth_it`` when at least ``min_small_fraction`` of the files are
    under half the target (rewriting a well-laid-out table wastes a full
    read+write of it)."""
    files = _list_data_files(spark, path)
    total = sum(sz for _, sz in files)
    small = sum(1 for _, sz in files if sz < target_bytes // 2)
    target = max(1, math.ceil(total / target_bytes)) if total else 1
    worth = (
        len(files) > target
        and len(files) > 0
        and small / len(files) >= min_small_fraction
    )
    return CompactionPlan(
        n_files=len(files),
        total_bytes=total,
        n_small_files=small,
        target_files=target,
        worth_it=worth,
    )


def _swap_aside(fs, jvm, tmp: str, dest: str, prev: str) -> None:
    """Rename-aside swap: ``dest -> prev``, ``tmp -> dest``, delete
    ``prev``.  Nothing is deleted until the new tree is live at ``dest``,
    so a crash at ANY point leaves the full old data at ``dest`` or
    ``prev`` and/or the full new data at ``tmp`` — always recoverable,
    never stranded (the delete-then-rename ordering this replaces could
    crash with the table missing at its path and the rewrite stuck in
    scratch).  ``dest`` is only absent for the instant between the two
    renames — both pure metadata operations."""
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_dest = jvm.org.apache.hadoop.fs.Path(dest)
    p_prev = jvm.org.apache.hadoop.fs.Path(prev)
    # stale prev from a run that crashed after its new tree went live but
    # before cleanup: finish that cleanup now so the aside-rename can land
    if fs.exists(p_prev) and fs.exists(p_dest):
        fs.delete(p_prev, True)
    if fs.exists(p_dest) and not fs.rename(p_dest, p_prev):
        raise IOError(f"compaction swap failed: rename-aside {dest} -> {prev}")
    if not fs.rename(p_tmp, p_dest):
        # roll the old tree back into place so dest never dangles
        fs.rename(p_prev, p_dest)
        raise IOError(f"compaction swap failed: rename {tmp} -> {dest}")
    fs.delete(p_prev, True)


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> CompactionPlan:
    """Rewrite the parquet dataset at ``path`` into ~``target_bytes`` files
    and swap it in place; returns the pre-rewrite plan.

    - Unpartitioned, no sort: ``coalesce(target_files)`` — a NARROW
      rewrite, no shuffle at all; each output task streams several input
      files into one output file.
    - ``sort_cols``: range-repartition + sortWithinPartitions — one
      shuffle, and the rewrite doubles as a cluster-by (restores row-group
      min/max selectivity that tiny files lost).
    - ``partition_cols``: hive layout preserved via one repartition on the
      partition key so each task owns whole partitions (the same
      anti-small-file rule as write_partitioned).

    The swap is rename-aside (old → __prev, scratch → path, delete
    __prev; see ``_swap_aside``) and assumes no concurrent writer; see
    the module docstring for the transactional caveat.  Compacting a
    STREAMING file sink's output additionally
    requires the stream to be stopped for good: the swap drops the sink's
    ``_spark_metadata`` transaction log, converting the directory into a
    plain parquet table — a restarted stream whose checkpoint references
    the dropped log must write to a fresh path.
    """
    plan = plan_compaction(spark, path, target_bytes)
    df = spark.read.parquet(path)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compacting")

    writer = None
    if partition_cols:
        out = df.repartition(*partition_cols)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        writer = (
            out.write.mode("overwrite")
            .option("maxRecordsPerFile", _rows_per_file(df, plan, target_bytes))
            .partitionBy(*partition_cols)
        )
    elif sort_cols:
        out = df.repartitionByRange(plan.target_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
        writer = out.write.mode("overwrite")
    else:
        writer = df.coalesce(plan.target_files).write.mode("overwrite")
    writer.parquet(tmp.toString())

    # rename-aside swap: old -> __prev, scratch -> path, delete __prev —
    # the table path never dangles and no state is unrecoverable mid-swap
    _swap_aside(
        fs, jvm, tmp.toString(), path.rstrip("/"), path.rstrip("/") + "__prev"
    )
    return plan


def _rows_per_file(df, plan: CompactionPlan, target_bytes: int) -> int:
    """maxRecordsPerFile for partitioned rewrites, estimated from the
    table's observed bytes-per-row (metadata total / a cheap count)."""
    n = df.count()
    if n == 0 or plan.total_bytes == 0:
        return 5_000_000
    bytes_per_row = plan.total_bytes / n
    return max(1, int(target_bytes / bytes_per_row))


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    values: list,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Incremental compaction: rewrite ONLY the named hive partitions of
    ``path`` (e.g. yesterday's date partitions, which streaming ingest
    just fragmented) and leave the rest of the table untouched.

    This is the shape that survives 100 TB — whole-table compaction
    rewrites everything to fix the newest 0.1%; per-partition compaction
    is O(recent data) and each partition directory swaps independently:
    a reader sees each partition's DATA either fully-old or fully-new
    (scratch is written outside the table root so partition discovery
    never lists a half-written or phantom directory), with the one
    caveat that the partition path is absent for the instant between the
    swap's two renames — a reader racing exactly that window sees the
    partition missing, never partial (pinned by
    tests/test_maintenance.py's reader-visible-states test).

    Returns {value: CompactionPlan} for the partitions actually rewritten
    (partitions already at target layout are skipped — plan-only cost).
    """
    out: dict = {}
    table = path.rstrip("/")
    for val in values:
        sub = f"{table}/{partition_col}={val}"
        plan = plan_compaction(spark, sub, target_bytes)
        if not plan.worth_it:
            continue
        df = spark.read.parquet(sub)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        hsub = jvm.org.apache.hadoop.fs.Path(sub)
        fs = hsub.getFileSystem(conf)
        # scratch AND aside dirs live OUTSIDE the table root (siblings of
        # the table directory, not of the partition directory): a
        # concurrent reader listing the parent table path must never
        # discover a phantom '{col}={val}__compacting' partition mid-
        # rewrite — hive partition discovery takes every non-hidden
        # subdirectory at face value.
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{table}__compacting_{partition_col}={val}"
        )
        if sort_cols:
            w = df.repartitionByRange(plan.target_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            w = df.coalesce(plan.target_files)
        w.write.mode("overwrite").parquet(tmp.toString())
        # drop the _SUCCESS marker BEFORE the swap so the partition dir is
        # byte-clean from the first instant it is visible at sub
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp.toString() + "/_SUCCESS"), False)
        # the rewrite of ONE partition dir must not carry a nested
        # partition column; reads go through the parent, which derives
        # the value from the directory name as before.
        _swap_aside(
            fs,
            jvm,
            tmp.toString(),
            sub,
            f"{table}__prev_{partition_col}={val}",
        )
        out[val] = plan
    return out


def recover_compaction_leftovers(spark: SparkSession, table: str) -> dict[str, list[str]]:
    """Crash recovery + GC for the rename-aside swap's leftovers.

    ``_swap_aside`` guarantees a crash never LOSES bytes, but it can leave
    them parked: ``…__prev*`` trees (crash after the new tree went live but
    before cleanup — or mid-swap, with the table missing at its path) and
    ``…__compacting*`` scratch trees (crash before the swap started).  This
    sweep finishes what the crashed run could not, in the only safe order:

    - ``__prev`` with the destination PRESENT → the new tree is live; the
      parked old tree is garbage → delete it (finishing the crashed run's
      last step).
    - ``__prev`` with the destination ABSENT → the crash hit between the
      two renames; the parked tree IS the table → rename it back
      (rollback, zero data loss).
    - ``__compacting`` / ``__merging`` scratch (compaction and
      load/table_merge share the swap machinery) → the rewrite never went
      live; the source is still intact at the destination → delete the
      scratch.  (If the
      destination is also gone, the scratch is the only copy: it is NOT
      deleted — reported under ``kept`` for operator attention instead of
      silently destroyed.)

    Run it on ingest startup, before any new compaction of the same table —
    never concurrently with one (it would mistake a live run's scratch for
    a leftover).  Returns {rolled_back, cleaned, kept} path lists so the
    caller's logs state exactly what happened."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    base = table.rstrip("/")
    parent = jvm.org.apache.hadoop.fs.Path(base).getParent()
    fs = jvm.org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    name = jvm.org.apache.hadoop.fs.Path(base).getName()

    rolled_back: list[str] = []
    cleaned: list[str] = []
    kept: list[str] = []
    if not fs.exists(parent):
        return {"rolled_back": rolled_back, "cleaned": cleaned, "kept": kept}
    leftovers = []
    for status in fs.listStatus(parent):
        p = status.getPath()
        n = p.getName()
        if n.startswith(name + "__"):
            leftovers.append((p, n[len(name):]))
    # all __prev rollbacks FIRST: a mid-swap crash leaves both a parked
    # __prev tree and a scratch tree for the same destination, and the
    # scratch's fate (garbage vs only-copy) depends on the rollback having
    # restored the destination before the scratch is judged
    for p, marker in sorted(leftovers, key=lambda t: not t[1].startswith("__prev")):
        # map the leftover back to its destination: table__prev -> table;
        # table__prev_col=val -> table/col=val (partition-scoped swaps put
        # their aside trees NEXT TO the table dir, not inside it)
        if marker.startswith("__prev"):
            suffix = marker[len("__prev"):]
            dest = base if not suffix else f"{base}/{suffix[1:]}"
            p_dest = jvm.org.apache.hadoop.fs.Path(dest)
            if fs.exists(p_dest):
                fs.delete(p, True)
                cleaned.append(p.toString())
            else:
                if not fs.rename(p, p_dest):
                    raise IOError(f"recovery rollback failed: {p} -> {dest}")
                rolled_back.append(dest)
        elif marker.startswith("__compacting") or marker.startswith("__merging"):
            prefix = "__compacting" if marker.startswith("__compacting") else "__merging"
            suffix = marker[len(prefix):]
            dest = base if not suffix else f"{base}/{suffix[1:]}"
            if fs.exists(jvm.org.apache.hadoop.fs.Path(dest)):
                fs.delete(p, True)
                cleaned.append(p.toString())
            else:
                kept.append(p.toString())
    return {"rolled_back": rolled_back, "cleaned": cleaned, "kept": kept}
