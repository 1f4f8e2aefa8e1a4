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
