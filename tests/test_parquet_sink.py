"""Partitioned-write layout contract: partition pruning + filter pushdown
visible in the physical plan of the read-back (load/parquet_sink.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.load.parquet_sink import read_pruned, write_partitioned
from cnics_to_fhir_spark.operators import dataset
from cnics_to_fhir_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    curated = dataset.curate_corpus(read_table(spark, SF, "documents"))
    path = str(tmp_path / "curated")
    write_partitioned(curated, path, partition_cols=["shard"], sort_cols=["bin_id"])

    back = read_pruned(spark, path)
    assert back.count() == curated.count()

    plan = (
        back.filter((F.col("shard") == "en") & (F.col("bin_id") == 0))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # directory-level skip on the partition column
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:120]
    # row-group-level stats filter on the sort column
    assert "PushedFilters" in plan and "bin_id" in plan.split("PushedFilters")[1][:120]


def test_partitioned_write_one_file_per_partition(spark, tmp_path):
    curated = dataset.curate_corpus(read_table(spark, SF, "documents"))
    path = str(tmp_path / "curated2")
    write_partitioned(curated, path, partition_cols=["shard"])

    import glob

    for d in glob.glob(path + "/shard=*"):
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1  # repartition-before-write: no small-file spray
