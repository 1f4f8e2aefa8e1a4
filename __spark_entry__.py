"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``cnics_to_fhir_spark.plans.registry`` — every implemented
operator from SURVEY.md §2 (plus the training-data-pipeline extensions) is a
named catalog entry pairing a Spark DataFrame builder with its DuckDB oracle
SQL. See cnics_to_fhir_spark/plans/{relational,transforms,scale_ops}.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the end-to-end conditions
    pipeline (extract → transform → FHIR assembly → MERGE action plan);
    driver checks rows>0."""
    from cnics_to_fhir_spark.plans import catalog

    return catalog()["e2e01_conditions_pipeline"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cnics_to_fhir_spark.plans import catalog

    return {name: e.spark for name, e in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops
    (MinHash/SimHash/sign-LSH — xxhash64-based), which pytest pins instead."""
    from cnics_to_fhir_spark.plans import catalog

    return {name: e.oracle for name, e in catalog().items() if e.oracle is not None}
