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
- **O(1) Spark jobs, not O(partitions)**: classification runs as ONE
  aggregation over the whole delta (grouped by partition × action ×
  key-present), the rewrite is ONE ``partitionBy`` job into a single
  scratch root, and the per-partition go-live step is a metadata rename
  fanned out on a thread pool.  A merge touching 1,000 partitions costs
  ~3 jobs + 1,000 concurrent renames, not ~5,000 sequential driver jobs.
- **Crash-safe swaps**: each rewritten partition lands via the
  rename-aside swap (maintenance._swap_aside) and inherits its recovery
  story (recover_compaction_leftovers rolls back or finishes interrupted
  swaps; the shared ``__merging`` scratch root is judged against the table
  root, which a mid-batch crash always leaves live partition-by-partition).
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

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators.merge import (
    ACTION_DELETE,
    ACTION_INSERT,
    ACTION_UPDATE,
)

_KNOWN = {ACTION_INSERT, ACTION_UPDATE, ACTION_DELETE}
_SWAP_THREADS = 16


def merge_into_table(
    spark: SparkSession,
    table: str,
    plan: DataFrame,
    key_col: str,
    partition_col: str,
    files_per_partition: int | None = None,
    probe_via_listing: bool = False,
) -> dict[str, int]:
    """Apply an action plan to the partitioned parquet table at ``table``.

    ``plan`` must carry ``key_col``, an ``action`` column, ``partition_col``
    (the partition every action row targets — for updates/deletes the
    partition the key lives in), and the payload columns of the table.
    Returns counts: inserted / updated / deleted / noop_missing_key /
    partitions_rewritten.

    ``files_per_partition`` bounds each rewritten partition dir to that
    many files (rows are spread across them by key hash); without it each
    rewritten partition lands as ONE file (the rewrite repartitions on the
    partition column, so a task owns whole partitions — no 32-task-file
    fragmentation for compaction to undo).  Size it to partition_bytes /
    target_file_bytes at scale.

    ``probe_via_listing`` replaces the per-touched-partition ``fs.exists``
    probe (one filesystem RPC per touched partition — fine for the
    documented hundreds-of-partitions regime, latency-bound when a merge
    touches 10⁵-10⁶ partitions on an object store) with ONE directory
    listing of the table root matched against the touched set.  Opt-in:
    the listing reads ALL partition names, so it only wins when touched ≫
    RPC-round-trip-budget and loses on a trickle merge into a very wide
    table.  The O(touched) driver-side partition list itself is inherent
    to the per-partition swap design and unaffected.
    """
    # ONE driver round-trip covers action validation AND the touched-
    # partition list: distinct (action, partition) pairs are bounded by
    # |actions| x |touched| (guide §5: each extra distinct().collect() is
    # a full plan scan + exchange + driver wait).
    ap = plan.select(
        "action", F.col(partition_col).alias("p")
    ).distinct().collect()
    bad = sorted({r["action"] for r in ap if r["action"] not in _KNOWN})
    if bad:
        raise ValueError(f"merge_into_table: unknown action labels {bad!r}")

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(table).getFileSystem(conf)

    def hpath(s: str):
        return jvm.org.apache.hadoop.fs.Path(s)

    from cnics_to_fhir_spark.load.maintenance import _swap_aside

    table = table.rstrip("/")
    payload_cols = [
        c for c in plan.columns if c not in (key_col, "action", "id", partition_col)
    ]
    parts = sorted({r["p"] for r in ap}, key=lambda p: (p is None, str(p)))
    # Spark's writer maps BOTH NULL and '' partition values to the same
    # __HIVE_DEFAULT_PARTITION__ directory, and '' reads back as NULL — so
    # an empty-string partition value would silently collapse into the NULL
    # partition (two distinct plan partitions, one directory).  NULL is
    # supported below (Hive default dir + null-safe joins); '' is an
    # ambiguity only the caller can resolve, so it fails loudly here.
    if any(p == "" for p in parts):
        raise ValueError(
            "merge_into_table: empty-string partition values collapse into "
            "the NULL partition on write (__HIVE_DEFAULT_PARTITION__); map "
            "them to NULL or a sentinel before merging"
        )

    # Partition DIRECTORY names must be built with Spark's own Hive path
    # escaping: partitionBy writes 'day=2024-01-01 10%3A00' for a value
    # containing ':', so a raw f"{col}={val}" path here would (a) miss the
    # existing partition (misclassifying its updates as noop_missing_key)
    # and (b) make _go_live swap in an EMPTY dir while the real merged
    # rows die with the scratch cleanup. Calling the JVM's escapePathName
    # keeps this bit-identical to whatever the writer does.  NULL values
    # get the writer's own default-partition name for the same reason.
    _catalog_utils = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    _esc = _catalog_utils.escapePathName
    _default_part = _catalog_utils.DEFAULT_PARTITION_NAME()

    def pdir(val) -> str:
        if val is None:
            return f"{partition_col}={_default_part}"
        return f"{partition_col}={_esc(str(val))}"

    # Touched partitions that already exist on disk are the ONLY ones read
    # — copy-on-write stays partition-scoped even though classification and
    # rewrite are now single global jobs.
    if probe_via_listing and fs.exists(hpath(table)):
        on_disk = {
            st.getPath().getName()
            for st in fs.listStatus(hpath(table))
            if st.isDirectory()
            and st.getPath().getName().startswith(f"{partition_col}=")
        }
        existing_subs = {
            val: f"{table}/{pdir(val)}" for val in parts if pdir(val) in on_disk
        }
    else:
        existing_subs = {
            val: f"{table}/{pdir(val)}"
            for val in parts
            if fs.exists(hpath(f"{table}/{pdir(val)}"))
        }
    if existing_subs:
        existing = (
            spark.read.option("basePath", table)
            .parquet(*existing_subs.values())
            .select(partition_col, key_col, *payload_cols)
        )
    else:
        existing = spark.createDataFrame(
            [], plan.select(partition_col, key_col, *payload_cols).schema
        )

    # Classify against what the table ACTUALLY holds — an update for an
    # absent key (or delete of one) is reported, not invented/ignored.
    # ONE semi-shaped join flags presence for every plan row; everything
    # downstream (counts AND rewrite content) reads the flagged plan, so
    # the whole merge classifies in a single aggregation instead of 4-5
    # actions per touched partition.
    # Joins on the partition column are NULL-SAFE: rows in the NULL
    # partition must match their on-disk counterparts (plain equality
    # would classify every NULL-partition update as noop_missing_key and
    # then resurrect the "deleted" old rows as survivors).
    present = (
        existing.select(
            F.col(partition_col).alias("__pp"), F.col(key_col).alias("__pk")
        )
        .distinct()
        .withColumn("__present", F.lit(True))
    )
    # The (action, present) tally rides the checkpoint materialization as
    # an Observation — same integer counts, one driver round-trip fewer
    # per merge (guide §5).
    from pyspark.sql import Observation

    def _tcount(action: str, pres: bool):
        cond = (F.col("action") == action) & (
            F.col("__present") if pres else ~F.col("__present")
        )
        return F.count(F.when(cond, F.lit(1))).alias(
            f"{action}_{'t' if pres else 'f'}"
        )

    obs = Observation()
    flagged = (
        plan.join(
            present,
            on=(
                F.col(partition_col).eqNullSafe(F.col("__pp"))
                & F.col(key_col).eqNullSafe(F.col("__pk"))
            ),
            how="left",
        )
        .drop("__pp", "__pk")
        .withColumn("__present", F.coalesce(F.col("__present"), F.lit(False)))
        .observe(
            obs,
            *[_tcount(a, p) for a in sorted(_KNOWN) for p in (True, False)],
        )
        .localCheckpoint()
    )
    got = obs.get  # blocks on the checkpoint job above
    tally = {
        (a, p): got[f"{a}_{'t' if p else 'f'}"]
        for a in sorted(_KNOWN)
        for p in (True, False)
    }
    counts = {
        "inserted": tally.get((ACTION_INSERT, True), 0)
        + tally.get((ACTION_INSERT, False), 0),
        "updated": tally.get((ACTION_UPDATE, True), 0),
        "deleted": tally.get((ACTION_DELETE, True), 0),
        "noop_missing_key": tally.get((ACTION_UPDATE, False), 0)
        + tally.get((ACTION_DELETE, False), 0),
        "partitions_rewritten": len(parts),
    }

    # Rewrite content: survivors = existing rows whose (partition, key) is
    # not touched by an update/delete; incoming = inserts + updates whose
    # key is present.  All keyed joins — no key list ever rides the driver.
    touched_keys = flagged.filter(
        F.col("action").isin(ACTION_UPDATE, ACTION_DELETE)
    ).select(F.col(partition_col).alias("__tp"), F.col(key_col).alias("__tk"))
    survivors = existing.join(
        touched_keys,
        on=(
            F.col(partition_col).eqNullSafe(F.col("__tp"))
            & F.col(key_col).eqNullSafe(F.col("__tk"))
        ),
        how="left_anti",
    )
    incoming = flagged.filter(
        (F.col("action") == ACTION_INSERT)
        | ((F.col("action") == ACTION_UPDATE) & F.col("__present"))
    ).select(partition_col, key_col, *payload_cols)
    merged = survivors.unionByName(incoming)

    # ONE partitioned write into a shared scratch root (a sibling of the
    # table, so partition discovery on the table never sees it; its name
    # maps back to the table root for recover_compaction_leftovers).  The
    # repartition keys whole partitions (plus a bounded key-hash salt when
    # files_per_partition is set) to one task each — no small-file spray.
    scratch_root = f"{table}__merging"
    if files_per_partition is not None:
        # explicit numPartitions: AQE coalesces hint-only repartitions by
        # size, collapsing the salt spread to one task at small volumes —
        # the ≤files_per_partition bound held but the spread the caller
        # asked for silently didn't (versioned_table measured it); salt
        # tuples colliding into one of N tasks mean fewer files, never
        # more, so the bound holds for any N.
        from cnics_to_fhir_spark.load.versioned_table import shuffle_partition_count

        n = shuffle_partition_count(merged)
        merged = merged.repartition(
            n,
            F.col(partition_col),
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(files_per_partition)),
        )
    else:
        merged = merged.repartition(F.col(partition_col))
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(scratch_root)

    # Go live: per-partition rename-aside swaps, pure metadata ops, fanned
    # out on a thread pool (independent directories).  The table root is
    # created first so the very first insert batch's rename is a metadata
    # op on every FileSystem — HDFS/object-store rename into a missing
    # parent returns false rather than creating it.
    fs.mkdirs(hpath(table))
    fs.delete(hpath(f"{scratch_root}/_SUCCESS"), False)

    def _go_live(val) -> None:
        tmp = f"{scratch_root}/{pdir(val)}"
        if not fs.exists(hpath(tmp)):
            # every plan row for this partition was a noop (or all rows
            # were deleted): the rewritten partition is EMPTY — represent
            # it as an empty dir so the swap semantics stay uniform
            fs.mkdirs(hpath(tmp))
        _swap_aside(
            fs,
            jvm,
            tmp,
            f"{table}/{pdir(val)}",
            f"{table}__prev_{pdir(val)}",
        )

    with ThreadPoolExecutor(max_workers=min(_SWAP_THREADS, max(len(parts), 1))) as ex:
        # list() propagates the first swap failure
        list(ex.map(_go_live, sorted(parts, key=str)))
    fs.delete(hpath(scratch_root), True)
    return counts
