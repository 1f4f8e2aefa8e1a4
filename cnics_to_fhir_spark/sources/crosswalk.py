"""S4 — UW MRN crosswalk source (cnics_to_fhir.py:290-304).

Reference semantics, reproduced exactly:
- header row skipped (:293 starts at row 1);
- rows whose SitePatientId is the literal string 'NULL' are dropped (:298);
- hmrn/umrn values that are 'NULL' are dropped per-field (:299-303);
- duplicate SitePatientId → LAST write wins, per file order (:299-303 dict
  overwrite).

Last-write-wins needs an order key; file order is materialized with
monotonically_increasing_id over a single-file read (stable within a file).
At scale the crosswalk is a small dimension — one file, broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_crosswalk(spark: SparkSession, path: str) -> DataFrame:
    """→ (SitePatientId, hmrn, umrn), one row per key, last-write-wins."""
    raw = (
        spark.read.option("header", "true")
        .csv(path)
        .toDF("hmrn", "umrn", "SitePatientId")
        .withColumn("__ord", F.monotonically_increasing_id())
    )
    cleaned = (
        raw.filter(F.col("SitePatientId") != "NULL")
        .withColumn("hmrn", F.when(F.col("hmrn") != "NULL", F.col("hmrn")))
        .withColumn("umrn", F.when(F.col("umrn") != "NULL", F.col("umrn")))
    )
    w = Window.partitionBy("SitePatientId").orderBy(F.col("__ord").desc())
    return (
        cleaned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("SitePatientId", "hmrn", "umrn")
    )


def attach_mrns(patients: DataFrame, crosswalk: DataFrame, key: str = "SitePatientId") -> DataFrame:
    """J4 — broadcast left join replacing the per-row dict probe
    (cnics_to_fhir.py:398-408)."""
    return patients.join(F.broadcast(crosswalk), on=key, how="left")
