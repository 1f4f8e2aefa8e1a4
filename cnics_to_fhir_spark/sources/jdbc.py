"""S1/S2 — JDBC sources for the CNICS and PRO MySQL databases.

The reference opens raw mysql.connector connections with per-site routing
(cnics_to_fhir.py:70-104) and splices WHERE clauses into SQL text
(:107-156). The Spark form is a JDBC reader per table with
``pushDownPredicate``/``pushDownLimit`` on (Catalyst ships the same filters
to MySQL, minus the string splicing), plus ``partitionColumn`` so a 100 TB
extract parallelizes across executors instead of one cursor.

This container has no MySQL driver jar or server, but Spark bundles the
embedded Derby driver, so the full ``.load()`` path — dialect resolution,
predicate pushdown, partitioned parallel scan — is integration-tested
against a real database (tests/test_jdbc.py) through the same reader the
MySQL deployment uses; only the URL/driver pair differs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


def decode_binary_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """MySQL dialect shim for the VARBINARY id asymmetry (SURVEY §1.2).

    Against real MySQL, ``SitePatientId`` arrives as bytes in the patient
    query (the reference calls ``.decode("utf-8")`` on it everywhere —
    cnics_to_fhir.py:271, :354, :388) but as str in the labs query (:736
    compares it directly).  Through Spark's JDBC reader that surfaces as
    BinaryType vs StringType for the *same logical column*, and a pipeline
    keyed on it would break (binary keys neither join nor render like
    strings).

    This shim UTF-8-decodes the named columns when — and only when — they
    are BinaryType (default: every BinaryType column in the frame), so the
    same downstream plan runs identically against either dialect shape.
    Embedded-Derby integration tests can't produce the MySQL shape, so
    tests/test_jdbc.py pins it with a BinaryType fixture instead."""
    from cnics_to_fhir_spark.functions.text import decode_utf8

    targets = (
        columns
        if columns is not None
        else [f.name for f in df.schema.fields if isinstance(f.dataType, BinaryType)]
    )
    for c in targets:
        if isinstance(df.schema[c].dataType, BinaryType):
            df = df.withColumn(c, decode_utf8(F.col(c)))
    return df


@dataclass(frozen=True)
class JdbcSource:
    """Connection profile for one database (cnics_to_fhir.py:70-104).

    site routing: the reference picks user/port/db by site for the PRO DB
    (:88-96); model that as one JdbcSource per (site, db).

    ``jdbc_url``/``driver`` override the MySQL defaults for other engines
    (the integration tests point them at Spark's bundled embedded Derby)."""

    host: str = ""
    port: int = 0
    database: str = ""
    user: str = ""
    password_env: str = "CNICS_DB_PASSWORD"  # never a literal secret
    fetch_size: int = 10_000
    jdbc_url: str | None = None
    driver: str | None = None

    @property
    def url(self) -> str:
        if self.jdbc_url:
            return self.jdbc_url
        return f"jdbc:mysql://{self.host}:{self.port}/{self.database}"

    def reader(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = "PatientId",
        num_partitions: int = 32,
        lower_bound: int = 0,
        upper_bound: int = 1 << 31,
    ) -> DataFrameReader:
        import os

        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("fetchsize", str(self.fetch_size))
            .option("pushDownPredicate", "true")
            .option("pushDownLimit", "true")
        )
        if self.user:
            r = r.option("user", self.user).option(
                "password", os.environ.get(self.password_env, "")
            )
        if self.driver:
            r = r.option("driver", self.driver)
        if partition_column:
            r = (
                r.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
            )
        return r

    def load(self, spark: SparkSession, table: str, **kw) -> DataFrame:
        return self.reader(spark, table, **kw).load()
