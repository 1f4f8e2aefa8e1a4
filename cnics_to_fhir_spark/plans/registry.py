"""Named-query registry: every operator in SURVEY.md §2 gets an entry here.

Each entry pairs a Spark DataFrame builder with the equivalent ANSI SQL for
the DuckDB oracle (None for genuinely non-SQL-expressible operators, which
the driver checks rows-only). ``__spark_entry__.py`` is a thin adapter over
this registry.

Determinism rules (the oracle compares an order-insensitive value hash):
- alias every computed column identically on both sides;
- round floating aggregates (money → 2 dp) on both sides;
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark stays
  long);
- never emit a nondeterministically-chosen row (LIMIT without total order,
  first() over duplicate keys, ...).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    tags: str  # SURVEY.md §2 operator ids this query exercises
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def query(name: str, tags: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = CatalogEntry(name=name, tags=tags, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cnics_to_fhir_spark.sources.tables import read_table

    return read_table(spark, sf_dir, name)


def catalog() -> dict[str, CatalogEntry]:
    # Import side-effect modules that populate the registry.
    from cnics_to_fhir_spark.plans import e2e, relational, scale_ops, transforms  # noqa: F401

    return dict(_REGISTRY)
