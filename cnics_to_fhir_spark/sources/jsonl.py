"""JSONL corpus source — the raw-crawl ingestion format of large-scale
training pipelines (one JSON document per line, dumps routinely contain
truncated/malformed lines).

Design:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full inference scan first — at 100 TB that doubles the
  read. Callers pass the document schema (or use ``DOC_SCHEMA``).
- **Corrupt lines are data, not exceptions.** PERMISSIVE mode routes any
  malformed line into a ``_corrupt_record`` column instead of failing the
  task; ``split_corrupt`` separates clean docs from a quarantine frame so
  a pipeline can load one and audit the other. (FAILFAST is the wrong
  default at corpus scale: one bad line out of 10¹² should not kill a
  12-hour job.)
- Scale shape: JSONL is line-splittable, so the scan parallelizes by
  HDFS/S3 block like any text source; the parse is JVM-side Jackson —
  no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """Corrupt-tolerant JSONL scan: clean lines parse into ``schema``'s
    typed columns; malformed lines land whole in ``_corrupt_record`` with
    every other column null. The schema MUST already contain the corrupt
    column (Spark requires it to be part of the declared schema)."""
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def clean_docs(df: DataFrame) -> DataFrame:
    """Docs that parsed: corrupt column null → dropped from the output."""
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def quarantine_lines(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """Malformed raw lines as (line, reason) — a text re-scan with a
    ``from_json`` null probe, because Spark disallows queries that
    reference ONLY the internal corrupt-record column of a JSON scan
    (the alternative workaround, caching the parsed corpus, is wrong at
    100 TB; re-scanning text costs one extra pass only when the
    quarantine is actually consumed, and prunes to the single raw-line
    column). ``from_json`` runs with the same corrupt-record column as
    the main scan, so a line is quarantined exactly when the main scan
    would have routed it to ``_corrupt_record``."""
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    # Blank/whitespace-only lines are silently skipped by Spark's JSON file
    # source, so they must never reach the quarantine. On current Spark,
    # from_json happens to yield a NULL corrupt column for such lines
    # anyway; this filter makes the exclusion explicit rather than relying
    # on that version-specific behavior (rlike, not trim: trim strips
    # spaces only, not tabs).
    raw = spark.read.text(path).filter(~F.col("value").rlike(r"^\s*$"))
    parsed = F.from_json(
        F.col("value"), schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
    )
    return (
        raw.filter(parsed.getField(CORRUPT_COL).isNotNull())
        .select(F.col("value").alias("line"))
        .withColumn("reason", F.lit("malformed_json"))
    )


def split_corrupt(
    df: DataFrame, spark: SparkSession | None = None, path: str | None = None
) -> tuple[DataFrame, DataFrame | None]:
    """→ (clean docs, quarantine or None). The quarantine side needs the
    source path (see ``quarantine_lines``); callers that only want clean
    docs can skip it."""
    q = quarantine_lines(spark, path) if spark is not None and path is not None else None
    return clean_docs(df), q
