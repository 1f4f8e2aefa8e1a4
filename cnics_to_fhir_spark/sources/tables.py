"""Parquet sources for the driver star schema (TESTDATA.md).

One ``spark.read.parquet`` per table — Catalyst handles predicate pushdown,
column pruning, and partition pruning from here, so callers should express
filters/projections declaratively rather than materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cnics_to_fhir_spark.schemas import STAR_COLUMNS, STAR_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _check_columns(name: str, df: DataFrame) -> None:
    expected = STAR_COLUMNS.get(name)
    if expected is None:
        return
    got = tuple(df.columns)
    if set(got) != set(expected):
        raise ValueError(
            f"testdata drift: table '{name}' has columns {list(got)}, "
            f"engine expects {list(expected)} — the driver testdata layout "
            "changed; update schemas.STAR_COLUMNS and any reader "
            "normalization in sources/tables.py"
        )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, normalizing physical quirks.

    ``events.ts`` has shipped in two physical encodings across driver
    testdata generations: TIMESTAMP(NANOS) — which Spark's parquet reader
    only accepts as long nanos via spark.sql.legacy.parquet.nanosAsLong —
    and plain ``timestamp[us]``. We read, then rebuild a microsecond
    timestamp ONLY when the column actually arrives as a long (matching
    DuckDB's ns→µs truncation); a native timestamp passes through untouched.
    """
    path = table_path(sf_dir, name)
    if name == "events":
        from pyspark.sql import functions as F

        try:
            df = spark.read.parquet(path)
        except Exception:
            # TIMESTAMP(NANOS) testdata: readable only with the legacy conf.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet timestamp[us] (isAdjustedToUTC=false) reads as
            # TIMESTAMP_NTZ; downstream plans (casts to long, window(),
            # unix_timestamp) were built against TimestampType. Session tz is
            # UTC (session.py), so this cast reinterprets the same wall-clock
            # value as the same instant — identical values to the nanos path.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        _check_columns(name, df)
        return df
    df = spark.read.parquet(path)
    _check_columns(name, df)
    return df


def load_star_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in STAR_TABLES}


def register_star_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so catalog queries can use SQL."""
    dfs = load_star_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
