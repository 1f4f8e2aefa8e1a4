"""Sharded corpus export with a VERIFIED manifest — the deliverable end
of a training-data pipeline.  Everything upstream (dedup, splits,
mixtures) exists to produce this artifact: N deterministic shards plus a
manifest stating per-shard row counts and order-independent content
checksums, so the CONSUMER (a training job, possibly a different stack
on a different cluster) can prove it loaded exactly what was exported —
a torn copy, a truncated shard, or a re-export that silently drifted all
fail at load, not as corrupted training three days later.

Design:

- Shard assignment is the engine-portable 60-bit md5 hash of the key,
  mod n_shards — deterministic across reruns, partitionings, and
  engines (ds04/ds07's discipline), so re-exporting unchanged data
  yields bit-identical shard membership and checksums.
- The per-shard checksum is the SUM of a per-row portable hash over the
  caller-named content columns, accumulated in DECIMAL(38,0) (a BIGINT
  sum of 2⁶⁰-scale terms wraps past ~8k rows; lb03's lesson) — an
  order-independent quantity BOTH engines can recompute declaratively,
  unlike a file-bytes digest which depends on parquet encoder details.
- One job writes every shard (repartition on the shard id — whole
  shards per task, no small-file spray); the manifest is computed in the
  SAME pass shape (one keyed aggregation) and written last, so a crash
  leaves data files without a manifest — an incomplete export is
  DETECTABLY incomplete, never silently short.

Scale shape: one corpus shuffle on the shard id, one map-side-combinable
keyed aggregation for the manifest; verification re-reads the export
with the same aggregation.  The manifest is O(shards) driver metadata.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_FILE = "_export_manifest.json"


def _row_hash(key_col: str, content_cols: list[str]) -> Column:
    from cnics_to_fhir_spark.operators.dedup import portable_hash

    sig = F.concat_ws(
        "\x1f", F.col(key_col).cast("string"),
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols],
    )
    return portable_hash(sig)


def _shard_stats(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    n_shards: int,
    use_physical_shard: bool = False,
) -> DataFrame:
    from cnics_to_fhir_spark.operators.dedup import portable_hash

    # verification groups by the PHYSICAL shard column read from the
    # directory layout — a row misfiled into the wrong shard dir then
    # shows up as TWO mismatched shards instead of silently re-bucketing
    # to where it should have been
    shard = (
        F.col("shard").cast("int")
        if use_physical_shard
        else (portable_hash(F.col(key_col).cast("string")) % n_shards).cast("int")
    )
    return (
        df.select(
            shard.alias("shard"),
            _row_hash(key_col, content_cols).alias("__h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("__sum"),
        )
        .select(
            "shard", "n_rows", F.col("__sum").cast("string").alias("checksum")
        )
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` plus the verification manifest.  Returns the manifest."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if os.path.exists(os.path.join(path, MANIFEST_FILE)):
        raise ValueError(f"export already exists at {path}")
    content_cols = content_cols or [
        c for c in df.columns if c != key_col
    ]
    from cnics_to_fhir_spark.operators.dedup import portable_hash

    shard = (portable_hash(F.col(key_col).cast("string")) % n_shards).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(F.col("shard"))
        .write.mode("errorifexists")
        .partitionBy("shard")
        .parquet(path)
    )
    stats = {
        r["shard"]: {"n_rows": r["n_rows"], "checksum": r["checksum"]}
        for r in _shard_stats(df, key_col, content_cols, n_shards).collect()
    }
    manifest = {
        "version": 1,
        "n_shards": n_shards,
        "key_col": key_col,
        "content_cols": content_cols,
        "total_rows": sum(s["n_rows"] for s in stats.values()),
        "shards": {str(k): v for k, v in sorted(stats.items())},
    }
    tmp = os.path.join(path, f".{MANIFEST_FILE}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.rename(tmp, os.path.join(path, MANIFEST_FILE))
    return manifest


def verify_export(spark: SparkSession, path: str) -> dict:
    """Re-read the export and recompute every shard's row count and
    checksum against the manifest; raises on ANY mismatch (missing
    shard, truncated shard, drifted content, extra rows).  Returns the
    verified manifest — consumers call this before training."""
    with open(os.path.join(path, MANIFEST_FILE)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(path)
    got = {
        r["shard"]: {"n_rows": r["n_rows"], "checksum": r["checksum"]}
        for r in _shard_stats(
            df,
            manifest["key_col"],
            manifest["content_cols"],
            manifest["n_shards"],
            use_physical_shard=True,
        ).collect()
    }
    want = {int(k): v for k, v in manifest["shards"].items()}
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        wrong = sorted(
            k for k in set(got) & set(want) if got[k] != want[k]
        )
        raise ValueError(
            f"export at {path} failed verification: missing shards {missing},"
            f" unexpected shards {extra}, mismatched shards {wrong}"
        )
    return manifest
