"""SparkSession builder tuned for this engine.

Local-mode testing runs on local[N]; the configs are chosen to also be the
right defaults on a real cluster at 100 TB:

- AQE on (runtime coalescing, skew-join splitting) so the same plan survives
  scale-up without hand-tuned partition counts.
- shuffle.partitions sized to cores locally; on a cluster this is overridden
  by AQE's coalescing from the initial value.
- UTC session timezone so timestamp semantics match the DuckDB oracle and
  are deployment-independent.
- Arrow enabled for any pandas-UDF path (similarity / multimodal operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cnics_to_fhir_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 128 MiB scan splits: with ~2-4x decompression this keeps per-task
        # working sets a few hundred MiB — safe against executor spill at
        # any corpus size, and small enough that a 100 TB scan still yields
        # ~800k tasks for even scheduling. Stated explicitly (it is the
        # default) so the sizing rule is visible next to shuffle.partitions.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    """Reuse an active session (the driver passes one in) or build ours."""
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
