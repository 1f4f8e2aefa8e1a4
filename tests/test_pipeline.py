"""End-to-end pipeline tests on CNICS-shaped fixtures (FIXTURES.md):
extract → transform → assemble → MERGE → action plan, no HTTP anywhere."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from cnics_to_fhir_spark import pipelines
from cnics_to_fhir_spark.schemas import DEMOGRAPHIC, DIAGNOSIS, FHIR_SNAPSHOT, LAB, MEDICATION


def _dx_rows(spark):
    rows = [
        # (DiagnosisId, filler1, Historical, PatientId, SiteRecordId, Date, Type, Name)
        (1, None, None, 10, bytearray(b"dx-1"), datetime.date(2020, 1, 1),
         "Verified clinical diagnosis", "E11.9"),
        (2, None, "Yes", 10, bytearray(b"dx-2"), datetime.date(2020, 1, 2),
         "Source unknown", "J44.1"),            # Historical='Yes' → filtered (P4)
        (3, None, "No", 11, bytearray(b"dx-3"), None,
         "Data collected at CNICS site", "COPD"),
        (4, None, None, 12, bytearray(b"dx-4"), datetime.date(2020, 2, 2),
         "Source unknown", "free text dx"),     # patient 12 not in page → dropped
    ]
    return spark.createDataFrame(rows, DIAGNOSIS)


def _page(spark):
    return spark.createDataFrame(
        [(10, "UW", "hapi-10"), (11, "UW", "hapi-11")],
        "PatientId long, Site string, fhir_patient_id string",
    )


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, FHIR_SNAPSHOT)


def test_conditions_plan_actions_and_body(spark):
    std = spark.createDataFrame([("COPD",)], "code string")
    existing = _snapshot(
        spark,
        [
            ("Condition", "srv-1", "Patient/hapi-10", "sys", "dx-1", True),   # match → update
            ("Condition", "srv-9", "Patient/hapi-10", "sys", "dx-gone", True),  # → delete
            ("Condition", "srv-8", "Patient/hapi-10", None, None, False),     # no identifier → ignored
        ],
    )
    plan = pipelines.conditions_plan(_dx_rows(spark), _page(spark), existing, std)
    rows = {r["key"]: r for r in plan.collect()}
    assert rows["dx-1"]["action"] == "update" and rows["dx-1"]["id"] == "srv-1"
    assert rows["dx-3"]["action"] == "insert" and rows["dx-3"]["id"] is None
    assert rows["dx-gone"]["action"] == "delete" and rows["dx-gone"]["body_json"] is None
    assert "dx-2" not in rows  # historical
    assert "dx-4" not in rows  # not in patient page
    body = json.loads(rows["dx-3"]["body_json"])
    assert body["code"]["coding"][0]["system"].endswith("/diagnosis-name")  # standard list
    assert body["subject"]["reference"] == "Patient/hapi-11"
    assert "recordedDate" not in body
    counts = {r["action"]: r["n"] for r in plan.groupBy("action").agg(F.count("*").alias("n")).collect()}
    assert counts == {"insert": 1, "update": 1, "delete": 1}


def test_conditions_name_filter_sql(spark):
    std = spark.createDataFrame([("COPD",)], "code string")
    existing = _snapshot(spark, [])
    plan = pipelines.conditions_plan(
        _dx_rows(spark), _page(spark), existing, std,
        name_filter_sql="DiagnosisName in ('E11.9') or DiagnosisName like 'E10.%'",
    )
    assert sorted(r["key"] for r in plan.collect()) == ["dx-1"]


def test_medications_plan(spark):
    med_rows = [
        (1, None, None, 10, bytearray(b"med-1"), "METFORMIN", None, None, None,
         None, None, None, datetime.date(2021, 1, 1), None, None),
        (2, None, None, 10, bytearray(b"med-2"), "", None, None, None,
         None, None, None, None, None, None),  # blank name → filtered (P5)
    ]
    med = spark.createDataFrame(med_rows, MEDICATION)
    existing = _snapshot(spark, [("MedicationRequest", "srv-m", "Patient/hapi-10", "s", "med-1", True)])
    plan = pipelines.medications_plan(med, _page(spark), existing)
    rows = {r["key"]: r for r in plan.collect()}
    assert rows["med-1"]["action"] == "update"
    assert json.loads(rows["med-1"]["body_json"])["status"] == "active"
    assert len(rows) == 1


def test_observations_plan(spark):
    lab_rows = [
        (1, None, None, 10, "lab-1", "Hemoglobin A1C", "5.7", None, None,
         datetime.datetime(2022, 1, 1), "3.5", "7.5"),
    ]
    lab = spark.createDataFrame(lab_rows, LAB)
    plan = pipelines.observations_plan(lab, _page(spark), _snapshot(spark, []))
    row = plan.collect()[0]
    assert row["action"] == "insert" and row["resource_type"] == "Observation"
    body = json.loads(row["body_json"])
    assert body["valueQuantity"]["value"] == 5.7
    assert body["referenceRange"][0]["low"]["value"] == 3.5


def test_patients_plan_end_to_end(spark):
    from cnics_to_fhir_spark.schemas import PRO

    page = spark.createDataFrame(
        [(10, "sp-10", "UW"), (11, "sp-11", "UW")],
        "PatientId long, SitePatientId string, Site string",
    )
    demo = spark.createDataFrame(
        [
            (2, None, None, 10, None, None, "Female", "Black", "No"),
            (1, None, None, 10, None, None, "Male", "White", "Yes"),  # lower DemographicId wins
        ],
        DEMOGRAPHIC,
    )
    pro = spark.createDataFrame([("sess-1", 10), ("sess-1", 10)], PRO)
    crosswalk = spark.createDataFrame(
        [("sp-10", "H1", None)], "SitePatientId string, hmrn string, umrn string"
    )
    pro_ident = spark.createDataFrame(
        [(11, ["901"], ["MRN-9"])],
        "PatientId long, pro_patient_ids array<string>, pro_mrns array<string>",
    )
    existing = _snapshot(spark, [("Patient", "hapi-10", None, "s", "sp-10", True)])
    plan = pipelines.patients_plan(page, demo, pro, crosswalk, pro_ident, existing)
    rows = {r["key"]: r for r in plan.collect()}
    assert rows["sp-10"]["action"] == "update"
    assert rows["sp-11"]["action"] == "insert"
    b10 = json.loads(rows["sp-10"]["body_json"])
    # first demographic row by DemographicId: (Male, White, Yes) — A3 ordering
    assert b10["gender"] == "male"
    idents = [(i["system"].rsplit("/", 2)[-2], i["value"]) for i in b10["identifier"]]
    assert ("site-patient-id", "sp-10") == (idents[0][0], idents[0][1])
    assert any(v == "sess-1" for _, v in idents)   # session id attached once
    assert sum(v == "sess-1" for _, v in idents) == 1  # DISTINCT (A1)
    assert any(v == "H1" for _, v in idents)       # crosswalk hmrn
    b11 = json.loads(rows["sp-11"]["body_json"])
    vals = [i["value"] for i in b11["identifier"]]
    assert "901" in vals and "MRN-9" in vals       # PRO fallback
