"""S1/S2 integration: run the JDBC reader through a real ``.load()``.

The deployment target is MySQL (cnics_to_fhir.py:70-104), whose driver jar
isn't in this container — but Spark bundles embedded Derby, and the reader
path under test (dialect resolution, predicate pushdown, partitioned
parallel scan) is engine-generic. We seed a Derby database through the
shared JVM, then drive ``JdbcSource.load`` exactly as the CNICS extract
would, asserting:

- rows and schema round-trip;
- Catalyst ships filters to the database (``PushedFilters`` in the scan);
- ``partitionColumn`` produces a genuinely parallel scan (one task per
  stride) — the 100 TB posture: never one cursor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnics_to_fhir_spark.sources.jdbc import JdbcSource

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby DB with a Patient-shaped table via the JVM."""
    db_dir = tmp_path_factory.mktemp("derby") / "cnicsdb"
    url = f"jdbc:derby:{db_dir}"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE Patient ("
        "PatientId INT PRIMARY KEY, SitePatientId VARCHAR(32), Site VARCHAR(8))"
    )
    ps = conn.prepareStatement("INSERT INTO Patient VALUES (?, ?, ?)")
    sites = ["uw", "ucsf", "case", "unc"]
    for pid in range(1, 201):
        ps.setInt(1, pid)
        ps.setString(2, f"sp-{pid:05d}")
        ps.setString(3, sites[pid % len(sites)])
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    st.close()
    conn.close()
    return url


@pytest.fixture(scope="module")
def source(derby_url):
    return JdbcSource(jdbc_url=derby_url, driver=DERBY_DRIVER)


def test_load_roundtrip(spark, source):
    df = source.load(
        spark,
        "Patient",
        partition_column="PatientId",
        num_partitions=4,
        lower_bound=1,
        upper_bound=201,
    )
    assert df.count() == 200
    assert [c.lower() for c in df.columns] == ["patientid", "sitepatientid", "site"]
    row = df.filter(F.col("PATIENTID") == 7).collect()[0]
    assert row["SITEPATIENTID"] == "sp-00007"


def test_partitioned_scan_is_parallel(spark, source):
    df = source.load(
        spark,
        "Patient",
        partition_column="PatientId",
        num_partitions=4,
        lower_bound=1,
        upper_bound=201,
    )
    # one JDBC cursor per stride — the anti-single-cursor guarantee
    assert df.rdd.getNumPartitions() == 4
    # strides must not drop or duplicate boundary rows
    assert df.select("PATIENTID").distinct().count() == 200


def test_unpartitioned_scan_is_single_cursor(spark, source):
    df = source.load(spark, "Patient", partition_column=None)
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 200


def test_filter_pushdown_reaches_database(spark, source):
    df = source.load(
        spark,
        "Patient",
        partition_column="PatientId",
        num_partitions=4,
        lower_bound=1,
        upper_bound=201,
    ).filter(F.col("SITE") == "uw")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "SITE" in plan and "uw" in plan, plan
    assert df.count() == 50


def test_limit_semantics(spark, source):
    # pushDownLimit only takes effect on the DSv2 JDBC *catalog* path; the
    # v1 format("jdbc") reader applies LIMIT Spark-side (CollectLimit over
    # the scan). Either plan must yield exactly 5 rows.
    df = source.load(spark, "Patient", partition_column=None).limit(5)
    assert df.count() == 5


def test_mysql_url_shape():
    s = JdbcSource(host="db.example.org", port=3306, database="cnics", user="etl")
    assert s.url == "jdbc:mysql://db.example.org:3306/cnics"


def test_varbinary_dialect_shim_matches_string_path(spark):
    """MySQL VARBINARY asymmetry (SURVEY §1.2): SitePatientId is bytes in
    the patient query (cnics_to_fhir.py:271 .decode('utf-8')) but str in
    labs (:736). decode_binary_columns must normalize the BinaryType shape
    so the SAME patients_plan yields byte-identical resources either way."""
    import json

    from cnics_to_fhir_spark import pipelines
    from cnics_to_fhir_spark.schemas import DEMOGRAPHIC, FHIR_SNAPSHOT, PRO
    from cnics_to_fhir_spark.sources.jdbc import decode_binary_columns

    page_str = spark.createDataFrame(
        [(10, "sp-10", "UW"), (11, "sp-ü11", "UW")],  # non-ASCII byte path
        "PatientId long, SitePatientId string, Site string",
    )
    # the MySQL shape: the same ids as VARBINARY → BinaryType
    page_bin = spark.createDataFrame(
        [
            (10, "sp-10".encode("utf-8"), "UW"),
            (11, "sp-ü11".encode("utf-8"), "UW"),
        ],
        "PatientId long, SitePatientId binary, Site string",
    )
    normalized = decode_binary_columns(page_bin)
    assert dict(normalized.dtypes)["SitePatientId"] == "string"
    # str columns pass through untouched (the labs-side shape)
    assert decode_binary_columns(page_str).schema == page_str.schema

    demo = spark.createDataFrame(
        [(1, None, None, 10, None, None, "Male", "White", "Yes")], DEMOGRAPHIC
    )
    pro = spark.createDataFrame([("sess-1", 10)], PRO)
    crosswalk = spark.createDataFrame(
        [("sp-10", "H1", None)], "SitePatientId string, hmrn string, umrn string"
    )
    pro_ident = spark.createDataFrame(
        [], "PatientId long, pro_patient_ids array<string>, pro_mrns array<string>"
    )
    existing = spark.createDataFrame([], FHIR_SNAPSHOT)

    def run(page):
        plan = pipelines.patients_plan(page, demo, pro, crosswalk, pro_ident, existing)
        return {
            r["key"]: json.loads(r["body_json"])
            for r in plan.filter(F.col("action") != "delete").collect()
        }

    golden = run(page_str)
    via_shim = run(normalized)
    assert via_shim == golden
    assert "sp-ü11" in via_shim  # multibyte UTF-8 survived the decode
