"""Config-driven job dispatch (entry point 1): INI parsing semantics and a
one-site end-to-end run producing the combined action plan."""

from __future__ import annotations

import datetime

from cnics_to_fhir_spark import job as jobmod
from cnics_to_fhir_spark.config import parse_job_config, parse_settings
from cnics_to_fhir_spark.schemas import DEMOGRAPHIC, DIAGNOSIS, FHIR_SNAPSHOT, PRO

JOB_INI = """
[JobList]
Job_1 = "uw,ucsd:cnics_prod:conditions,observations"
Job_2 = "jh:cnics_prod:medicationrequests"
"""

SETTINGS_INI = """
[Main]
PatCnt = "1000"
CrosswalkFile = "UW_patient_Crosswalk.csv"

[Filters]
ConditionsFilter = "DiagnosisName in ('E11.9', 'COPD') or DiagnosisName like 'E10.%'"
ObservationsFilter = "TestName in ('Hemoglobin A1C')"
"""


def test_parse_job_config_splits_like_reference():
    jobs = parse_job_config(JOB_INI)
    assert jobs[0].sites == ("uw", "ucsd")
    assert jobs[0].db_name == "cnics_prod"
    assert jobs[0].resources == ("conditions", "observations")
    assert jobs[1].sites == ("jh",) and jobs[1].resources == ("medicationrequests",)


def test_parse_settings_strips_quotes():
    s = parse_settings(SETTINGS_INI)
    assert s.pat_cnt == 1000
    assert s.conditions_filter_sql.startswith("DiagnosisName in")
    assert s.observations_filter_sql == "TestName in ('Hemoglobin A1C')"
    assert s.crosswalk_path == "UW_patient_Crosswalk.csv"
    assert s.medications_filter_sql is None


def test_run_job_one_site_end_to_end(spark):
    settings = parse_settings(SETTINGS_INI)
    job = parse_job_config(JOB_INI)[0]

    patient = spark.createDataFrame(
        [(10, bytearray(b"sp-10"), "uw"), (11, bytearray(b"sp-11"), "uw"), (12, bytearray(b"sp-12"), "ucsd")],
        "PatientId long, SitePatientId binary, Site string",
    )
    demo = spark.createDataFrame(
        [(1, None, None, 10, None, None, "Female", "Black", "No"),
         (2, None, None, 11, None, None, "Male", "White", "Yes"),
         (3, None, None, 12, None, None, "Male", "Asian", "No")],
        DEMOGRAPHIC,
    )
    dx = spark.createDataFrame(
        [(1, None, None, 10, bytearray(b"dx-1"), datetime.date(2020, 1, 1),
          "Verified clinical diagnosis", "E11.9"),
         (2, None, None, 10, bytearray(b"dx-2"), datetime.date(2020, 1, 1),
          "Source unknown", "not-in-filter")],
        DIAGNOSIS,
    )
    snapshot = spark.createDataFrame(
        [
            ("Patient", "hapi-10", None,
             "https://cnics.cirg.washington.edu/site-patient-id/uw", "sp-10", True),
            # another site's resource — must NOT be deleted by this job's sites
            ("Patient", "hapi-99", None,
             "https://cnics.cirg.washington.edu/site-patient-id/jh", "sp-99", True),
        ],
        FHIR_SNAPSHOT,
    )
    empty_pro = spark.createDataFrame([], PRO)
    empty = {
        "Lab": spark.createDataFrame(
            [], "LabId long, f1 string, Historical string, PatientId long, SiteRecordId string, "
                "TestName string, Result string, Units string, f8 string, CollectionDate timestamp, "
                "RefRangeLow string, RefRangeHigh string"),
        "ProPatients": spark.createDataFrame([], "PatientID long, MRN string"),
        "ProSessions": spark.createDataFrame([], "SessionID string, PatientID long"),
        "Crosswalk": spark.createDataFrame([], "SitePatientId string, hmrn string, umrn string"),
        "StandardDiagnoses": spark.createDataFrame([("COPD",)], "code string"),
    }

    def tables_for_site(site):
        t = {"Patient": patient, "Demographic": demo, "Diagnosis": dx,
             "Pro": empty_pro, "Snapshot": snapshot, **empty}
        return lambda name: t[name]

    plan = jobmod.run_job(spark, job, settings, tables_for_site)
    rows = [r.asDict() for r in plan.collect()]

    pat = {r["key"]: r for r in rows if r["resource_type"] == "Patient"}
    # uw site: sp-10 exists → update; sp-11 new → insert. ucsd: sp-12 insert.
    assert pat["sp-10"]["action"] == "update" and pat["sp-10"]["site"] == "uw"
    assert pat["sp-11"]["action"] == "insert"
    assert pat["sp-12"]["action"] == "insert" and pat["sp-12"]["site"] == "ucsd"

    assert "sp-99" not in pat  # other-site resource untouched (site scoping)

    cond = {r["key"]: r for r in rows if r["resource_type"] == "Condition"}
    assert list(cond) == ["dx-1"]  # filter dropped 'not-in-filter' (P6)
    # existing Patient id resolved; subject uses the server id
    assert '"Patient/hapi-10"' in cond["dx-1"]["body_json"]
    # no MedicationRequest rows — job gates them off (P10)
    assert not [r for r in rows if r["resource_type"] == "MedicationRequest"]
