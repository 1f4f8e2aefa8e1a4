"""§2.10 made driver-visible: streaming replay ≡ batch MERGE, as a catalog
entry with a full DuckDB oracle.

Rounds 1-3 proved the batch↔stream equivalence in pytest only
(tests/test_streaming.py); this entry moves it inside the driver's
CORRECTNESS gate.  The query executes a REAL Structured Streaming run —
a parquet file-source split into micro-batches (maxFilesPerTrigger=1),
``foreachBatch`` re-running the production ``merge_plan`` per batch in CDC
mode (streaming/reconcile.py, cnics_to_fhir.py:548-570 semantics) — then
returns the accumulated action plan.  The oracle computes the same
classification declaratively in SQL, so the hash compare pins that
micro-batched replay and one-shot batch semantics agree row-for-row.

CDC mode (``full_state=False``) is what makes the split-into-batches
well-defined: each row's classification depends only on (row, snapshot),
never on which micro-batch carried it, so any file-to-batch assignment
yields the same union — that independence is exactly the property under
test.  (``full_state=True`` derives deletes from per-batch absence and is
only equivalent when the whole state arrives in one batch — covered by
pytest.)

Harness-vs-production note: the per-batch ``collect`` here is the test
sink; the production sink hands each micro-batch plan to the partitioned
HTTP writer (load/http_writer.py) without driver materialization.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnics_to_fhir_spark.plans.registry import query, table


@query(
    "st01_stream_batch_equivalence",
    tags="2.10 J6 STREAM",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS key,
               CASE WHEN c_custkey % 3 = 0 THEN 'insert' ELSE 'update' END AS action,
               CASE WHEN c_custkey % 3 = 0 THEN NULL
                    ELSE 'srv-' || CAST(c_custkey AS VARCHAR) END AS id,
               c_name AS body
        FROM customer
    """,
)
def st01_stream_batch_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the change stream (customer rows, 4 micro-batches) through
    ``reconcile_stream`` against a snapshot missing every key ≡ 0 (mod 3);
    the streamed union of per-batch MERGE plans must equal the one-shot
    declarative classification the oracle computes."""
    from cnics_to_fhir_spark.streaming.reconcile import reconcile_stream

    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("key"),
        F.col("c_name").alias("body"),
    )
    snapshot = cust.filter(F.col("key") % 3 != 0).select(
        "key", F.concat(F.lit("srv-"), F.col("key").cast("string")).alias("id")
    )

    tmp = tempfile.mkdtemp(prefix="st01-")
    try:
        src, chk = os.path.join(tmp, "src"), os.path.join(tmp, "chk")
        cust.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("key long, body string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rows: list = []

        def sink(plan: DataFrame, epoch_id: int) -> None:
            rows.extend(plan.collect())

        q = reconcile_stream(
            stream,
            lambda: snapshot,
            sink,
            key="key",
            checkpoint_dir=chk,
            payload_cols=["body"],
            full_state=False,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "key long, action string, id string, body string")
