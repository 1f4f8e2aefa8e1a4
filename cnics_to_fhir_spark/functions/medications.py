"""Medication status derivation (F4, cnics_to_fhir.py:41-46).

start is NULL            → 'unknown'
start set, end set       → 'stopped'
start set, end NULL      → 'active'
(end_type is accepted and ignored, exactly like the reference signature.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def med_status(start_date: Column, end_date: Column, end_type: Column | None = None) -> Column:
    return (
        F.when(start_date.isNull(), F.lit("unknown"))
        .when(end_date.isNotNull(), F.lit("stopped"))
        .otherwise(F.lit("active"))
    )


def med_code(medication_name: Column) -> Column:
    """Double-space collapse used for the coding code (cnics_to_fhir.py:702).

    The reference does ONE ``str.replace("  ", " ")`` pass, which replaces
    non-overlapping occurrences left-to-right (so three spaces collapse to
    two, not one). ``regexp_replace`` on the literal two-space pattern has
    identical non-overlapping left-to-right semantics.
    """
    return F.regexp_replace(medication_name, "  ", " ")
