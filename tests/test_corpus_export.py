"""Sharded export + verified manifest (load/corpus_export.py): roundtrip,
determinism across partitionings, and every corruption class failing at
verify — never at training time."""

from __future__ import annotations

import glob
import json
import os

import pytest

from cnics_to_fhir_spark.load.corpus_export import (
    MANIFEST_FILE,
    export_shards,
    verify_export,
)


def _docs(spark, n=200):
    return spark.createDataFrame(
        [(i, f"text body {i}", "src" + str(i % 3)) for i in range(n)],
        "doc_id long, text string, source string",
    )


def test_roundtrip_and_deterministic_manifest(spark, tmp_path):
    df = _docs(spark)
    m1 = export_shards(df, str(tmp_path / "a"), n_shards=8)
    assert m1["total_rows"] == 200 and len(m1["shards"]) == 8
    assert verify_export(spark, str(tmp_path / "a")) == m1
    # re-export of the same data under ANY partitioning: identical manifest
    m2 = export_shards(df.repartition(7), str(tmp_path / "b"), n_shards=8)
    assert m2 == m1
    # double-export refused
    with pytest.raises(ValueError, match="already exists"):
        export_shards(df, str(tmp_path / "a"), n_shards=8)


def test_every_corruption_class_fails_verification(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "e")
    export_shards(df, path, n_shards=4)

    # truncated shard: delete one shard's data file
    victim = sorted(glob.glob(os.path.join(path, "shard=2", "*.parquet")))[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="failed verification"):
        verify_export(spark, path)

    # drifted content: re-export elsewhere, tamper with the manifest
    path2 = str(tmp_path / "f")
    export_shards(df, path2, n_shards=4)
    mp = os.path.join(path2, MANIFEST_FILE)
    doc = json.load(open(mp))
    doc["shards"]["1"]["checksum"] = "42"
    json.dump(doc, open(mp, "w"))
    with pytest.raises(ValueError, match="mismatched shards \\[1\\]"):
        verify_export(spark, path2)


def test_misfiled_row_surfaces_as_two_mismatched_shards(spark, tmp_path):
    import shutil

    df = _docs(spark, n=80)
    path = str(tmp_path / "g")
    export_shards(df, path, n_shards=4)
    # move one shard's file into another shard dir: physical grouping must
    # flag BOTH shards rather than silently re-bucketing by hash
    src = sorted(glob.glob(os.path.join(path, "shard=0", "*.parquet")))[0]
    shutil.move(src, os.path.join(path, "shard=3", "misfiled.parquet"))
    with pytest.raises(ValueError, match="failed verification"):
        verify_export(spark, path)
