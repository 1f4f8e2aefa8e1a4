"""Optional REAL-MySQL integration test (SURVEY §1.2 dialect fidelity).

The sandbox has no MySQL server or Connector/J jar, so every JDBC path is
integration-tested against embedded Derby (tests/test_jdbc.py) with the
MySQL-specific shapes pinned by fixtures. This module closes the carried
"real-MySQL dialect fidelity" item as far as it can be closed here: when a
real server IS available, set

    SPARK_GRAFT_MYSQL_URL=jdbc:mysql://host:port/db?user=u&password=p

(and have the Connector/J jar on Spark's driver/executor classpath, e.g.
``spark.jars``) and this test exercises the three server-specific behaviors
the Derby tests cannot:

- zero dates ('0000-00-00'): must surface as NULL via
  zeroDateTimeBehavior=convertToNull, the reference's effective semantics
  (mysql.connector returns None for zero dates);
- VARBINARY ids: arrive as BinaryType and round-trip through
  decode_binary_columns to the exact source string;
- collation: a case-insensitive (utf8mb4_general_ci) column compares
  case-insensitively server-side under pushed-down predicates, and the
  raw bytes come back unmodified.

Skipped (not failed) when the env var is absent.
"""

from __future__ import annotations

import os

import pytest

MYSQL_URL = os.environ.get("SPARK_GRAFT_MYSQL_URL")

pytestmark = pytest.mark.skipif(
    not MYSQL_URL,
    reason="set SPARK_GRAFT_MYSQL_URL to a jdbc:mysql:// URL (with "
    "Connector/J on the classpath) to run the real-MySQL dialect tests",
)


def _url_with(param: str) -> str:
    sep = "&" if "?" in MYSQL_URL else "?"
    return f"{MYSQL_URL}{sep}{param}"


@pytest.fixture(scope="module")
def mysql_fixture(spark):
    """Create a throwaway table exercising zero dates, VARBINARY, and a
    case-insensitive collation — via JDBC round-trips only (no mysql
    client dependency)."""
    from py4j.java_gateway import java_import

    gw = spark.sparkContext._gateway
    java_import(gw.jvm, "java.sql.DriverManager")
    conn = gw.jvm.java.sql.DriverManager.getConnection(
        _url_with("allowMultiQueries=true&sessionVariables=sql_mode=''")
    )
    st = conn.createStatement()
    table = "spark_graft_dialect_probe"
    st.execute(f"DROP TABLE IF EXISTS {table}")
    st.execute(
        f"""CREATE TABLE {table} (
            id INT PRIMARY KEY,
            site_pid VARBINARY(16),
            name VARCHAR(32) CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci,
            d DATE
        )"""
    )
    st.execute(
        f"INSERT INTO {table} VALUES "
        "(1, _binary'sp-10', 'Alice', '2020-01-01'), "
        "(2, _binary'sp-11', 'ALICE', '0000-00-00'), "
        "(3, NULL, 'bob', NULL)"
    )
    yield table
    st.execute(f"DROP TABLE {table}")
    conn.close()


def test_mysql_zero_date_varbinary_collation(spark, mysql_fixture):
    from cnics_to_fhir_spark.sources.jdbc import JdbcSource, decode_binary_columns

    src = JdbcSource(jdbc_url=_url_with("zeroDateTimeBehavior=convertToNull"))
    df = (
        src.reader(spark, mysql_fixture, partition_column="id", num_partitions=2,
                   lower_bound=0, upper_bound=10)
        .load()
    )
    rows = {r["id"]: r for r in decode_binary_columns(df).collect()}

    # zero date -> NULL (the mysql.connector None the reference relies on)
    assert rows[2]["d"] is None
    assert str(rows[1]["d"]) == "2020-01-01"

    # VARBINARY arrives binary, decodes to the exact source string
    raw = {r["id"]: r for r in df.collect()}
    assert isinstance(raw[1]["site_pid"], (bytes, bytearray))
    assert rows[1]["site_pid"] == "sp-10" and rows[3]["site_pid"] is None

    # collation: pushed-down equality on a _ci column matches both cases
    # server-side; the returned bytes keep their original case
    ci = df.filter(df["name"] == "alice").collect()
    assert sorted(r["id"] for r in ci) == [1, 2]
    assert sorted(r["name"] for r in ci) == ["ALICE", "Alice"]
