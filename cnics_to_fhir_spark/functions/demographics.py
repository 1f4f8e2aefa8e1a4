"""Race / ethnicity / birth-sex mappings (F8-F10, cnics_to_fhir.py:444-523).

Each returns a struct(code, display) or code Column; NULL when the source
value is NULL or unmapped (the reference appends no extension in that case —
the assembly layer drops NULL structs with array_compact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OMB_SYSTEM = "urn:oid:2.16.840.1.113883.6.238"

RACE_MAP = {
    # cnics_to_fhir.py:444-468 — note the two collapsing pairs:
    # Asian/Pacific Islander + Pacific Islander → 2076-8; Multiracial + Other → 2131-1
    "American Indian": ("1002-5", "American Indian or Alaska Native"),
    "Asian": ("2028-9", "Asian"),
    "Asian/Pacific Islander": ("2076-8", "Native Hawaiian or Other Pacific Islander"),
    "Black": ("2054-5", "Black or African American"),
    "Pacific Islander": ("2076-8", "Native Hawaiian or Other Pacific Islander"),
    "White": ("2106-3", "White"),
    "Multiracial": ("2131-1", "Other Race"),
    "Other": ("2131-1", "Other Race"),
}

ETHNICITY_MAP = {
    # cnics_to_fhir.py:487-493
    "No": ("2186-5", "Non Hispanic or Latino"),
    "Yes": ("2135-2", "Hispanic or Latino"),
}


def _code_display(col: Column, mapping: dict[str, tuple[str, str]]) -> Column:
    expr: Column | None = None
    for k, (code, display) in mapping.items():
        branch = F.struct(F.lit(code).alias("code"), F.lit(display).alias("display"))
        expr = F.when(col == k, branch) if expr is None else expr.when(col == k, branch)
    assert expr is not None
    return expr  # otherwise → NULL struct


def race_coding(race: Column) -> Column:
    """F8 — struct(code, display) or NULL."""
    return _code_display(race, RACE_MAP)


def ethnicity_coding(hispanic: Column) -> Column:
    """F9 — struct(code, display) or NULL."""
    return _code_display(hispanic, ETHNICITY_MAP)


def birth_sex_code(sex: Column) -> Column:
    """F10 — 'Female'→'F', 'Male'→'M', else NULL (cnics_to_fhir.py:512-516)."""
    return F.when(sex == "Female", F.lit("F")).when(sex == "Male", F.lit("M"))


def gender(sex: Column) -> Column:
    """F10 — gender = lower(sex), only when birth sex mapped
    (cnics_to_fhir.py:517-523 sets gender inside the same branch)."""
    return F.when(birth_sex_code(sex).isNotNull(), F.lower(sex))
