"""Named StructType schemas for every table the engine touches.

The reference uses ``select *`` + positional tuple indexing everywhere
(cnics_to_fhir.py:110-151, consumed e.g. :441, :574, :800); the de-facto
ordinal schemas are reconstructed in FIXTURES.md and declared here by NAME so
Catalyst's column pruning actually bites (the reference never prunes —
SURVEY.md §4). Ordinal positions are preserved in field order for parity
documentation.

Bytes asymmetry (SURVEY.md §7.4): SitePatientId and the diagnosis/medication
record ids are BinaryType (MySQL VARBINARY, decoded at cnics_to_fhir.py:271,
:556, :652), while the lab record id is already a string (compared undecoded
at :736, :892). The schemas encode that asymmetry.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# CNICS database (cnics_to_fhir.py:70-84, queries :107-156)
# ---------------------------------------------------------------------------

PATIENT = T.StructType(
    [
        T.StructField("PatientId", T.LongType(), False),
        T.StructField("SitePatientId", T.BinaryType(), True),
        T.StructField("Site", T.StringType(), True),
    ]
)

DEMOGRAPHIC = T.StructType(
    [
        T.StructField("DemographicId", T.LongType(), False),
        T.StructField("filler1", T.StringType(), True),
        T.StructField("filler2", T.StringType(), True),
        T.StructField("PatientId", T.LongType(), True),
        T.StructField("filler4", T.StringType(), True),
        T.StructField("filler5", T.StringType(), True),
        T.StructField("Sex", T.StringType(), True),
        T.StructField("Race", T.StringType(), True),
        T.StructField("Hispanic", T.StringType(), True),
    ]
)

DIAGNOSIS = T.StructType(
    [
        T.StructField("DiagnosisId", T.LongType(), False),
        T.StructField("filler1", T.StringType(), True),
        T.StructField("Historical", T.StringType(), True),
        T.StructField("PatientId", T.LongType(), True),
        T.StructField("SiteRecordId", T.BinaryType(), True),
        T.StructField("DiagnosisDate", T.DateType(), True),
        T.StructField("DiagnosisType", T.StringType(), True),
        T.StructField("DiagnosisName", T.StringType(), True),
    ]
)

MEDICATION = T.StructType(
    [
        T.StructField("MedicationId", T.LongType(), False),
        T.StructField("filler1", T.StringType(), True),
        T.StructField("Historical", T.StringType(), True),
        T.StructField("PatientId", T.LongType(), True),
        T.StructField("SiteRecordId", T.BinaryType(), True),
        T.StructField("MedicationName", T.StringType(), True),
        T.StructField("filler6", T.StringType(), True),
        T.StructField("filler7", T.StringType(), True),
        T.StructField("filler8", T.StringType(), True),
        T.StructField("filler9", T.StringType(), True),
        T.StructField("filler10", T.StringType(), True),
        T.StructField("filler11", T.StringType(), True),
        T.StructField("StartDate", T.DateType(), True),
        T.StructField("EndDate", T.DateType(), True),
        T.StructField("EndType", T.StringType(), True),
    ]
)

LAB = T.StructType(
    [
        T.StructField("LabId", T.LongType(), False),
        T.StructField("filler1", T.StringType(), True),
        T.StructField("Historical", T.StringType(), True),
        T.StructField("PatientId", T.LongType(), True),
        # string, NOT binary — the lab merge key is compared undecoded
        # (cnics_to_fhir.py:736, :892)
        T.StructField("SiteRecordId", T.StringType(), True),
        T.StructField("TestName", T.StringType(), True),
        T.StructField("Result", T.StringType(), True),
        T.StructField("Units", T.StringType(), True),
        T.StructField("filler8", T.StringType(), True),
        T.StructField("CollectionDate", T.TimestampType(), True),
        T.StructField("RefRangeLow", T.StringType(), True),
        T.StructField("RefRangeHigh", T.StringType(), True),
    ]
)

PRO = T.StructType(
    [
        T.StructField("SessionId", T.StringType(), True),
        T.StructField("PatientId", T.LongType(), True),
    ]
)

# PRO "Reveal" database (cnics_to_fhir.py:85-104, :51-56)
PRO_PATIENTS = T.StructType(
    [
        T.StructField("PatientID", T.LongType(), True),
        T.StructField("MRN", T.StringType(), True),
    ]
)

PRO_SESSIONS = T.StructType(
    [
        T.StructField("SessionID", T.StringType(), True),
        T.StructField("PatientID", T.LongType(), True),
    ]
)

# UW crosswalk CSV (cnics_to_fhir.py:290-304)
CROSSWALK = T.StructType(
    [
        T.StructField("hmrn", T.StringType(), True),
        T.StructField("umrn", T.StringType(), True),
        T.StructField("SitePatientId", T.StringType(), True),
    ]
)

# Existing-FHIR-store snapshot (reconciliation input; FIXTURES.md §4,
# cnics_to_fhir.py:328-337, :548-570)
FHIR_SNAPSHOT = T.StructType(
    [
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("subject_ref", T.StringType(), True),
        T.StructField("identifier_0_system", T.StringType(), True),
        T.StructField("identifier_0_value", T.StringType(), True),
        T.StructField("has_identifier", T.BooleanType(), True),
    ]
)

# The reconciliation engine's central IR (SURVEY.md §3.3): one row per write.
ACTION_PLAN = T.StructType(
    [
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("action", T.StringType(), False),  # insert|update|delete
        T.StructField("id", T.StringType(), True),  # server id (update/delete)
        T.StructField("key", T.StringType(), True),  # business key
        T.StructField("body_json", T.StringType(), True),  # null for delete
    ]
)

CNICS_TABLES: dict[str, T.StructType] = {
    "Patient": PATIENT,
    "DemographicAltered": DEMOGRAPHIC,
    "DiagnosisAltered": DIAGNOSIS,
    "MedicationAltered": MEDICATION,
    "LabAltered": LAB,
    "ProAltered": PRO,
    "Patients": PRO_PATIENTS,
    "Sessions": PRO_SESSIONS,
}

# Driver star-schema table names (TESTDATA.md)
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Expected logical columns per star table, as observed from the driver's
# parquet (TESTDATA.md). ``read_table`` checks names on every read so a
# silent testdata regeneration fails with one clear message instead of a
# cascade of opaque AnalysisExceptions downstream (round-2 postmortem:
# VERDICT.md "What's wrong" §1).
STAR_COLUMNS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part": ("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders": (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ),
    "lineitem": (
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ),
    "events": ("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents": ("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings": ("vec_id", "embedding", "label"),
}
