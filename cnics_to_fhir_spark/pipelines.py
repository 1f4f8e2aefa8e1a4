"""End-to-end resource pipelines: extract → transform → assemble → reconcile.

Each pipeline turns CNICS-shaped tables plus an existing-store snapshot into
an ACTION-PLAN DataFrame ``(resource_type, action, id, key, body_json)`` —
the engine's central IR (SURVEY.md §3.3). The reference's control flow
(cnics_to_fhir.py:339-904: per patient, per resource row, one HTTP call) is
re-expressed as five bulk stages with exactly one shuffle each:

  1. bulk extract with pushed-down filters         (operators/extract.py)
  2. patient-page join (broadcast)                 (J3 decorrelated)
  3. columnar transform + resource assembly        (functions/, assembly/)
  4. full-outer MERGE against the snapshot         (operators/merge.py)
  5. counters from the plan                        (A5)

The same plan feeds the batch writer (load/http_writer.py) and the
foreachBatch incremental mode (streaming/) unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cnics_to_fhir_spark.assembly import (
    condition_resource,
    medication_request_resource,
    observation_resource,
    patient_resource,
)
from cnics_to_fhir_spark.operators import extract
from cnics_to_fhir_spark.operators.merge import merge_plan


def _plan(current: DataFrame, existing: DataFrame, resource_type: str) -> DataFrame:
    """MERGE current (key, body_json) vs snapshot rows of one type."""
    snap = existing.filter(
        (F.col("resource_type") == resource_type)
        & F.coalesce(F.col("has_identifier"), F.lit(True))
    ).select(F.col("identifier_0_value").alias("key"), "id")
    return merge_plan(current, snap, key="key", existing_id="id", payload_cols=["body_json"]).select(
        F.lit(resource_type).alias("resource_type"),
        "action",
        "id",
        "key",
        "body_json",
    )


def conditions_plan(
    dx: DataFrame,
    patient_page: DataFrame,
    existing_snapshot: DataFrame,
    standard_codes: DataFrame,
    name_filter_sql: str | None = None,
) -> DataFrame:
    """The §7.2 vertical: DiagnosisAltered → Condition action plan.

    ``patient_page`` needs (PatientId, Site, fhir_patient_id);
    ``standard_codes`` is the S3 code table (broadcast membership J8)."""
    from cnics_to_fhir_spark.sources.code_tables import membership_via_join

    cur = (
        extract.diagnoses(dx, name_filter_sql=name_filter_sql)
        .join(F.broadcast(patient_page), "PatientId", "inner")
        .withColumn("__dx_key", F.decode("SiteRecordId", "UTF-8"))
    )
    cur = membership_via_join(cur, standard_codes, "DiagnosisName", "in_standard")
    body = condition_resource(
        F.col("Site"),
        F.col("fhir_patient_id"),
        F.col("DiagnosisName"),
        F.col("DiagnosisType"),
        F.col("DiagnosisDate"),
        F.col("__dx_key"),
        in_standard=F.col("in_standard"),
    )
    current = cur.select(
        F.col("__dx_key").alias("key"), F.to_json(body).alias("body_json")
    )
    return _plan(current, existing_snapshot, "Condition")


def medications_plan(
    med: DataFrame,
    patient_page: DataFrame,
    existing_snapshot: DataFrame,
    name_filter_sql: str | None = None,
) -> DataFrame:
    cur = (
        extract.medications_extract(med, name_filter_sql=name_filter_sql)
        .join(F.broadcast(patient_page), "PatientId", "inner")
        .withColumn("__med_key", F.decode("SiteRecordId", "UTF-8"))
    )
    body = medication_request_resource(
        F.col("Site"),
        F.col("fhir_patient_id"),
        F.col("MedicationName"),
        F.col("StartDate"),
        F.col("EndDate"),
        F.col("EndType"),
        F.col("__med_key"),
    )
    current = cur.select(F.col("__med_key").alias("key"), F.to_json(body).alias("body_json"))
    return _plan(current, existing_snapshot, "MedicationRequest")


def observations_plan(
    lab: DataFrame,
    patient_page: DataFrame,
    existing_snapshot: DataFrame,
    name_filter_sql: str | None = None,
) -> DataFrame:
    cur = extract.labs_extract(lab, name_filter_sql=name_filter_sql).join(
        F.broadcast(patient_page), "PatientId", "inner"
    )
    body = observation_resource(
        F.col("Site"),
        F.col("fhir_patient_id"),
        F.col("TestName"),
        F.col("Result"),
        F.col("Units"),
        F.col("CollectionDate"),
        F.col("RefRangeLow"),
        F.col("RefRangeHigh"),
        # lab record id is ALREADY a string (cnics_to_fhir.py:736, :892)
        F.col("SiteRecordId"),
    )
    current = cur.select(F.col("SiteRecordId").alias("key"), F.to_json(body).alias("body_json"))
    return _plan(current, existing_snapshot, "Observation")


def patients_plan(
    patient_page: DataFrame,
    demographic: DataFrame,
    pro: DataFrame,
    crosswalk: DataFrame,
    pro_identity: DataFrame,
    existing_snapshot: DataFrame,
) -> DataFrame:
    """B1 + J4/J2/A2/A3 + the site-level anti-join delete (J5).

    ``patient_page``: (PatientId, SitePatientId, Site);
    ``pro_identity``: (PatientId, pro_patient_ids, pro_mrns) from
    extract.pro_identity; ``crosswalk``: (SitePatientId, hmrn, umrn)."""
    demo1 = extract.demographics_first_row(demographic).select(
        "PatientId", "Sex", "Race", "Hispanic"
    )
    sessions = extract.pro_sessions(pro)
    cur = (
        patient_page.join(F.broadcast(crosswalk), "SitePatientId", "left")
        .join(sessions, "PatientId", "left")
        .join(pro_identity, "PatientId", "left")
        .join(demo1, "PatientId", "left")
    )
    body = patient_resource(
        F.col("Site"),
        F.col("SitePatientId"),
        F.col("session_ids"),
        F.col("hmrn"),
        F.col("umrn"),
        F.col("pro_patient_ids"),
        F.col("pro_mrns"),
        F.col("Race"),
        F.col("Hispanic"),
        F.col("Sex"),
    )
    current = cur.select(F.col("SitePatientId").alias("key"), F.to_json(body).alias("body_json"))
    return _plan(current, existing_snapshot, "Patient")
