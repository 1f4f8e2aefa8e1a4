"""Parquet sources for the driver star schema (TESTDATA.md).

One ``spark.read.parquet`` per table — Catalyst handles predicate pushdown,
column pruning, and partition pruning from here, so callers should express
filters/projections declaratively rather than materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cnics_to_fhir_spark.schemas import STAR_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, normalizing physical quirks.

    ``events.parquet`` carries TIMESTAMP(NANOS), which Spark's parquet reader
    rejects ([PARQUET_TYPE_ILLEGAL]); we read it as long nanos
    (spark.sql.legacy.parquet.nanosAsLong — a runtime-settable SQL conf) and
    rebuild a microsecond timestamp with integer division, matching DuckDB's
    ns→µs truncation.
    """
    path = table_path(sf_dir, name)
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_star_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in STAR_TABLES}


def register_star_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so catalog queries can use SQL."""
    dfs = load_star_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
