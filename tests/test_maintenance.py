"""Small-file compaction: plan math, row preservation, layout, idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cnics_to_fhir_spark.load.maintenance import (
    compact_partitions,
    compact_table,
    plan_compaction,
)


def _data_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith("_") and not f.startswith(".") and f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return out


def _fragmented_table(spark, path, n_rows=4000, n_files=40):
    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_plan_counts_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented_table(spark, path)
    plan = plan_compaction(spark, path, target_bytes=1 << 20)
    assert plan.n_files == 40
    assert plan.n_small_files == 40  # every fragment is far below 512 KiB
    assert plan.target_files == 1  # 4000 tiny rows fit one 1 MiB file
    assert plan.worth_it


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented_table(spark, path)
    before = spark.read.parquet(path)
    expected_sum = before.agg(F.sum("id")).collect()[0][0]
    expected_n = before.count()

    plan = compact_table(spark, path, target_bytes=1 << 20)
    assert plan.n_files == 40

    after = spark.read.parquet(path)
    assert after.count() == expected_n
    assert after.agg(F.sum("id")).collect()[0][0] == expected_sum
    assert len(_data_files(path)) == 1


def test_compact_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented_table(spark, path)
    compact_table(spark, path, target_bytes=1 << 20)
    plan2 = plan_compaction(spark, path, target_bytes=1 << 20)
    assert plan2.n_files == plan2.target_files == 1
    assert not plan2.worth_it  # second rewrite would not pay for itself


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    # fragment WITHIN each hive partition
    df.repartition(20).write.mode("overwrite").partitionBy("grp").parquet(path)
    assert len(_data_files(path)) > 30

    compact_table(spark, path, target_bytes=1 << 20, partition_cols=["grp"])
    after = spark.read.parquet(path)
    assert after.count() == 2000
    parts = [d for d in os.listdir(path) if d.startswith("grp=")]
    assert sorted(parts) == ["grp=0", "grp=1", "grp=2"]
    assert len(_data_files(path)) == 3  # one file per partition

    # partition pruning still works on the compacted layout
    pruned = after.filter(F.col("grp") == 1)
    assert pruned.count() == sum(1 for i in range(2000) if i % 3 == 1)
    plan_str = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan_str and "grp" in plan_str


def test_compact_sorted_restores_rowgroup_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented_table(spark, path)
    compact_table(spark, path, target_bytes=16 << 10, sort_cols=["id"])
    after = spark.read.parquet(path)
    assert after.count() == 4000
    files = _data_files(path)
    assert len(files) > 1  # 16 KiB target splits the table
    # each file covers a disjoint id range (range-partitioned rewrite)
    import duckdb

    con = duckdb.connect()
    ranges = []
    for f in files:
        lo, hi = con.execute(
            f"SELECT MIN(id), MAX(id) FROM read_parquet('{f}')"
        ).fetchone()
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next


def test_compact_streaming_sink_output(spark, tmp_path):
    """The compaction consumer that actually exists at 100 TB: a streaming
    file sink appends one file per (trigger × partition); compaction
    collapses the accretion without losing a row."""
    import json

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    # three micro-batches, one jsonl file each
    for b in range(3):
        with open(src / f"b{b}.jsonl", "w") as f:
            for i in range(100):
                f.write(json.dumps({"id": b * 100 + i, "v": i % 7}) + "\n")
        stream = (
            spark.readStream.schema("id long, v long")
            .json(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    before = spark.read.parquet(out)
    n_before = before.count()
    assert n_before == 300
    assert len(_data_files(out)) >= 3  # at least one file per trigger

    plan = compact_table(spark, out, target_bytes=1 << 20)
    assert plan.worth_it
    after = spark.read.parquet(out)
    assert after.count() == 300
    assert after.agg(F.sum("id")).collect()[0][0] == sum(range(300))
    assert len(_data_files(out)) == 1


def test_plan_skips_streaming_metadata_log(spark, tmp_path):
    # a _spark_metadata/ log holds plainly-named files ("0", "1") that must
    # not count as data in the plan
    import os as _os

    path = str(tmp_path / "t")
    _fragmented_table(spark, path, n_rows=100, n_files=2)
    meta = _os.path.join(path, "_spark_metadata")
    _os.makedirs(meta)
    with open(_os.path.join(meta, "0"), "w") as f:
        f.write("{}" * 1000)
    plan = plan_compaction(spark, path, target_bytes=1 << 20)
    assert plan.n_files == 2


def test_compact_partitions_incremental(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(3000).select(F.col("id"), (F.col("id") % 3).alias("day"))
    df.repartition(15).write.mode("overwrite").partitionBy("day").parquet(path)
    files_before = {d: len(_data_files(os.path.join(path, f"day={d}"))) for d in (0, 1, 2)}
    assert all(n > 5 for n in files_before.values())

    done = compact_partitions(spark, path, "day", [0, 2], target_bytes=1 << 20)
    assert set(done) == {0, 2}
    # targeted partitions collapsed; untouched partition kept its layout
    assert len(_data_files(os.path.join(path, "day=0"))) == 1
    assert len(_data_files(os.path.join(path, "day=2"))) == 1
    assert len(_data_files(os.path.join(path, "day=1"))) == files_before[1]

    after = spark.read.parquet(path)
    assert after.count() == 3000
    assert after.groupBy("day").count().count() == 3
    assert after.agg(F.sum("id")).collect()[0][0] == sum(range(3000))

    # second pass: nothing worth rewriting
    assert compact_partitions(spark, path, "day", [0, 2], target_bytes=1 << 20) == {}
