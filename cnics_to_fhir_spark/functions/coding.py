"""Diagnosis code-system dispatch and category/verification maps (F1-F3, F5-F7).

Semantics match the reference's regex dispatch (cnics_to_fhir.py:11-39) and
field-mapping dicts (cnics_to_fhir.py:225-244), re-expressed as native Column
``when`` chains so they run JVM-side under whole-stage codegen — no Python
UDFs anywhere in the hot path (SURVEY.md §2.11).

Dispatch order (first match wins, cnics_to_fhir.py:12-18):
  1. ``^[A-Z]\\d{2}`` and not ``^V``    → ICD-10-CM
  2. ``^\\d{3}`` or ``^V\\d{2}``        → ICD-9-CM
  3. member of the standard-diagnosis code table → CNICS system
  4. else                                → SNOMED "Clinical finding" fallback

The standard-code membership (a 641-row table in the reference, loaded into a
Python list at cnics_to_fhir.py:190-193 and probed per row) becomes either an
``isin`` over a small literal list or — the scale path — a broadcast left
join + null test, so a 100 TB diagnosis table never ships the dimension.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

ICD10_SYSTEM = "http://hl7.org/fhir/sid/icd-10-cm"
ICD9_SYSTEM = "http://hl7.org/fhir/sid/icd-9-cm"
CNICS_DX_SYSTEM = "https://cnics.cirg.washington.edu/diagnosis-name"
SNOMED_SYSTEM = "http://snomed.info/sct"
SNOMED_FALLBACK_CODE = "404684003"
SNOMED_FALLBACK_PREFIX = "Clinical finding (finding): "

# Python re.search("^[A-Z][0-9]{2}", x) — prefix match, so rlike with ^ anchor.
_ICD10_RE = "^[A-Z][0-9]{2}"
_V_RE = "^V"
_ICD9_RE = "^[0-9]{3}"
_VCODE_RE = "^V[0-9]{2}"


def is_icd10(dx: Column) -> Column:
    return dx.rlike(_ICD10_RE) & ~dx.rlike(_V_RE)


def is_icd9(dx: Column) -> Column:
    return dx.rlike(_ICD9_RE) | dx.rlike(_VCODE_RE)


def _dispatch(dx: Column, in_standard: Column, icd: Column, std: Column, other: Column) -> Column:
    return (
        F.when(is_icd10(dx), icd)
        .when(is_icd9(dx), icd)
        .when(in_standard, std)
        .otherwise(other)
    )


def dx_coding_system(dx: Column, in_standard: Column) -> Column:
    """F1 — cnics_to_fhir.py:31-39."""
    return (
        F.when(is_icd10(dx), F.lit(ICD10_SYSTEM))
        .when(is_icd9(dx), F.lit(ICD9_SYSTEM))
        .when(in_standard, F.lit(CNICS_DX_SYSTEM))
        .otherwise(F.lit(SNOMED_SYSTEM))
    )


def dx_coding_code(dx: Column, in_standard: Column) -> Column:
    """F2 — cnics_to_fhir.py:11-19."""
    return _dispatch(dx, in_standard, dx, dx, F.lit(SNOMED_FALLBACK_CODE))


def dx_coding_display(dx: Column, in_standard: Column) -> Column:
    """F3 — cnics_to_fhir.py:21-29."""
    return _dispatch(
        dx, in_standard, dx, dx, F.concat(F.lit(SNOMED_FALLBACK_PREFIX), dx)
    )


def standard_membership(dx: Column, standard_codes: Iterable[str]) -> Column:
    """Small-list membership for tests / bounded code tables."""
    return dx.isin(list(standard_codes))


# --- field-mapping dicts (cnics_to_fhir.py:225-244) as when-chains ---------

DX_TO_CATEGORY = {
    "Data collected at CNICS site": "encounter-diagnosis",
    "Patient reported without supporting outside documentation": "health-concern",
    "Reported in outside documentation": "problem-list-item",
    "Source unknown": "health-concern",
    "Verified clinical diagnosis": "problem-list-item",
}

CATEGORY_CODE_TO_DISPLAY = {
    "encounter-diagnosis": "Encounter Diagnosis",
    "health-concern": "Health Concern",
    "problem-list-item": "Problem List Item",
    "16100001": "Death Diagnosis",
}

DX_TO_VERIFICATION_STATUS = {
    "Data collected at CNICS site": "confirmed",
    "Patient reported without supporting outside documentation": "unconfirmed",
    "Reported in outside documentation": "confirmed",
    "Source unknown": "unconfirmed",
    "Verified clinical diagnosis": "confirmed",
}


def map_lookup(col: Column, mapping: dict[str, str]) -> Column:
    """Dict probe → when-chain; missing keys → NULL (the reference would
    KeyError — the engine surfaces NULL and lets callers assert)."""
    expr: Column | None = None
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)) if expr is None else expr.when(col == k, F.lit(v))
    assert expr is not None
    return expr


def dx_category(dx_type: Column) -> Column:
    """F5 — cnics_to_fhir.py:225-231, applied :616."""
    return map_lookup(dx_type, DX_TO_CATEGORY)


def category_display(category_code: Column) -> Column:
    """F6 — cnics_to_fhir.py:232-237, applied :617."""
    return map_lookup(category_code, CATEGORY_CODE_TO_DISPLAY)


def dx_verification_status(dx_type: Column) -> Column:
    """F7 — cnics_to_fhir.py:238-244, applied :615."""
    return map_lookup(dx_type, DX_TO_VERIFICATION_STATUS)
