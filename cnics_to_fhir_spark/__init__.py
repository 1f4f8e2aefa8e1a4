"""cnics_to_fhir_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
uwcirg/cnics-to-fhir (reference: /root/reference/cnics_to_fhir.py), expressed
Spark-first: DataFrame/SQL logical plans, Catalyst optimization, broadcast
joins for code tables, full-outer MERGE reconciliation, and batched writers —
replacing the reference's single-threaded per-patient N+1 loop
(cnics_to_fhir.py:339-351) with O(#tables) bulk reads + joins.

Layout (SURVEY.md §7):
  session      — tuned SparkSession builder
  schemas      — named StructTypes for the CNICS/PRO tables (SURVEY.md §1.2)
  sources      — parquet/CSV/JDBC/FHIR readers (S1-S6, S10-S12)
  functions    — scalar transform layer F1-F22 as native Column expressions
  operators    — extract (decorrelated J3), merge (J5-J7), dedup, similarity,
                 text analysis, event windows
  assembly     — FHIR resource builders B1-B4 (nested struct → to_json)
  load         — foreachPartition HTTP writer (S7-S9, E1-E2)
  plans        — the named-query catalog driving __spark_entry__.py
  streaming    — foreachBatch incremental reconciliation
"""

__version__ = "0.1.0"
