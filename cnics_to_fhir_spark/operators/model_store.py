"""Trained-artifact store: the train-once / serve-many seam.

Several operators TRAIN state before they can serve: k-means centroids
(cl01, feeding ann04/ann06/dd09), BPE merge tables (tx08, feeding tx10),
PQ codebooks (ann07/ann09), language-model vocabularies (tx07/tx09).  In
the catalog each entry retrains inline so the oracle can replay the
trajectory, but a production pipeline trains on a schedule and SERVES from
an artifact — retraining per query would be both wasteful and, worse,
silently version-skewed (an IVF index probed with centroids other than the
ones that built it loses recall without erroring; kmeans_train's docstring
makes the same point).

This module is that seam, deliberately boring: an artifact is a small
DataFrame (centroids: k×dim rows; merges: n_merges rows; codebooks:
subspaces×codes rows) written as parquet next to a JSON manifest carrying
``kind``, free-form ``params``, the schema, the row count, and an
order-independent content checksum.  ``load_model`` re-verifies all four —
a half-written or hand-edited artifact fails loudly at LOAD time, not as
silent recall loss three queries later.  Versioning is by path (the caller
owns naming, e.g. ``.../ivf_centroids/v=2024-08-15``); a loaded artifact's
``params`` say what built it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "model.json"


def _checksum(df: DataFrame) -> str:
    """Order-independent content hash: sum of per-row xxhash64 over the
    row's JSON rendering, in exact decimal (no overflow under ANSI mode).
    The same engine writes and verifies, so JSON float rendering is
    self-consistent."""
    row = df.select(
        F.sum(
            F.xxhash64(F.to_json(F.struct(*df.columns))).cast("decimal(38,0)")
        ).alias("c")
    ).collect()[0]
    return str(row["c"])


def save_model(
    df: DataFrame,
    path: str,
    kind: str,
    params: dict | None = None,
    overwrite: bool = False,
) -> dict:
    """Persist a trained-artifact DataFrame at ``path`` (parquet + JSON
    manifest).  Artifacts are model-sized, not corpus-sized — they are
    written single-file so the store stays a cheap directory copy.
    Returns the manifest."""
    if os.path.exists(os.path.join(path, _MANIFEST)) and not overwrite:
        raise FileExistsError(
            f"artifact already exists at {path} (pass overwrite=True, or "
            "version by path — the caller owns naming)"
        )
    manifest = {
        "kind": kind,
        "params": params or {},
        "schema": df.schema.simpleString(),
        "n_rows": df.count(),
        "checksum": _checksum(df),
    }
    df.coalesce(1).write.mode("overwrite" if overwrite else "errorifexists").parquet(
        os.path.join(path, "data")
    )
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_model(
    spark: SparkSession, path: str, expect_kind: str | None = None
) -> tuple[DataFrame, dict]:
    """Load an artifact and VERIFY it: kind (when the caller states what it
    expects), schema, row count, and content checksum must all match the
    manifest.  Returns (DataFrame, manifest)."""
    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"no artifact manifest at {path}/{_MANIFEST}")
    if expect_kind is not None and manifest["kind"] != expect_kind:
        raise ValueError(
            f"artifact kind mismatch at {path}: stored "
            f"{manifest['kind']!r}, caller expects {expect_kind!r}"
        )
    df = spark.read.parquet(os.path.join(path, "data"))
    if df.schema.simpleString() != manifest["schema"]:
        raise ValueError(
            f"artifact schema drift at {path}: stored {manifest['schema']}, "
            f"read {df.schema.simpleString()}"
        )
    n = df.count()
    if n != manifest["n_rows"]:
        raise ValueError(
            f"artifact row-count mismatch at {path}: manifest says "
            f"{manifest['n_rows']}, data has {n}"
        )
    c = _checksum(df)
    if c != manifest["checksum"]:
        raise ValueError(
            f"artifact checksum mismatch at {path} — the data files were "
            "modified after the manifest was written"
        )
    return df, manifest


def save_centroids(
    spark: SparkSession,
    centroids: list[tuple[int, list[float]]],
    path: str,
    params: dict | None = None,
    overwrite: bool = False,
) -> dict:
    """Driver-side centroid list (kmeans_train's second return) → artifact."""
    df = spark.createDataFrame(centroids, "cid int, cv array<double>")
    return save_model(df, path, kind="kmeans_centroids", params=params, overwrite=overwrite)


def load_centroids(spark: SparkSession, path: str) -> list[tuple[int, list[float]]]:
    """Artifact → the exact list shape ivf_topk_multiprobe/ann06 consume."""
    df, _ = load_model(spark, path, expect_kind="kmeans_centroids")
    return [(r["cid"], list(r["cv"])) for r in df.orderBy("cid").collect()]
