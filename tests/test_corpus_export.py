"""Sharded export + verified manifest (load/corpus_export.py): roundtrip,
determinism across partitionings, and every corruption class failing at
verify — never at training time."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

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


def test_input_dag_executes_once(spark, tmp_path):
    """export_shards consumes its input twice (write + manifest agg); the
    eager localCheckpoint must make the UPSTREAM run exactly once — at
    100 TB re-running a full curation pipeline to compute the manifest is
    a second full pipeline execution (the round-9 e2e13 bench paid it)."""
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    md = str(marker_dir)

    def touch(batches):
        import os
        import uuid

        for pdf in batches:
            if len(pdf):
                open(os.path.join(md, uuid.uuid4().hex), "w").close()
            yield pdf

    df = _docs(spark, n=100).repartition(4).mapInPandas(
        touch, schema="doc_id long, text string, source string"
    )
    export_shards(df, str(tmp_path / "once"), n_shards=4)
    n_first = len(os.listdir(md))
    assert n_first <= 4  # one marker per non-empty input partition, once


def test_load_shard_verifies_per_shard(spark, tmp_path):
    import shutil

    from cnics_to_fhir_spark.load.corpus_export import load_shard

    df = _docs(spark, n=120)
    path = str(tmp_path / "ls")
    m = export_shards(df, path, n_shards=4)
    # clean read: rows match the manifest count, shard column present
    got = load_shard(spark, path, 2)
    assert got.count() == m["shards"]["2"]["n_rows"]
    assert set(r["shard"] for r in got.select("shard").distinct().collect()) == {2}
    # other shards untouched by this read path: still verify independently
    load_shard(spark, path, 0)

    # unknown shard id
    with pytest.raises(ValueError, match="not in the manifest"):
        load_shard(spark, path, 99)

    # truncation: drop shard 1's file -> ONLY shard 1 fails
    victim = sorted(glob.glob(os.path.join(path, "shard=1", "*.parquet")))[0]
    backup = str(tmp_path / "victim.bak")
    shutil.move(victim, backup)
    with pytest.raises(ValueError, match="shard 1 directory missing|failed verification"):
        load_shard(spark, path, 1)
    load_shard(spark, path, 2)  # unaffected shard still loads
    shutil.move(backup, victim)

    # content drift: a foreign file smuggled into shard 3
    src = sorted(glob.glob(os.path.join(path, "shard=0", "*.parquet")))[0]
    shutil.copy(src, os.path.join(path, "shard=3", "smuggled.parquet"))
    with pytest.raises(ValueError, match="shard 3 .* failed verification"):
        load_shard(spark, path, 3)


def test_update_export_incremental_equals_full_reexport(spark, tmp_path):
    """The incremental-update contract: after update_export, the manifest
    (and the artifact) are IDENTICAL to a from-scratch export of the
    post-change corpus, but only the touched shards' files moved."""
    from cnics_to_fhir_spark.load.corpus_export import update_export

    df = _docs(spark, n=200)
    path = str(tmp_path / "inc")
    export_shards(df, path, n_shards=8)
    before = {
        d: {f: os.stat(os.path.join(path, d, f)).st_mtime_ns
            for f in os.listdir(os.path.join(path, d))}
        for d in os.listdir(path) if d.startswith("shard=")
    }

    changes = spark.createDataFrame(
        [
            (7, "update", "text body 7 REVISED", "src1"),
            (13, "update", "text body 13 REVISED", "src1"),
            (42, "delete", None, None),
            (9000, "insert", "fresh doc", "srcX"),
        ],
        "doc_id long, change string, text string, source string",
    )
    res = update_export(spark, path, changes)
    assert res["inserted"] == 1 and res["updated"] == 2 and res["deleted"] == 1
    assert res["noop_missing_key"] == 0
    assert res["shards_rewritten"] <= 4  # at most one shard per changed key
    manifest = verify_export(spark, path)

    # untouched shards: every file byte-identical (mtime pin)
    touched_dirs = set()
    for d, files in before.items():
        now = {f: os.stat(os.path.join(path, d, f)).st_mtime_ns
               for f in os.listdir(os.path.join(path, d))} if os.path.isdir(
                   os.path.join(path, d)) else {}
        if now != files:
            touched_dirs.add(d)
    assert len(touched_dirs) == res["shards_rewritten"]

    # equivalence: a from-scratch export of the post corpus produces the
    # IDENTICAL manifest
    post = (
        df.filter(F.col("doc_id") != 42)
        .withColumn(
            "text",
            F.when(F.col("doc_id").isin(7, 13),
                   F.concat(F.col("text"), F.lit(" REVISED")))
            .otherwise(F.col("text")),
        )
        .unionByName(spark.createDataFrame(
            [(9000, "fresh doc", "srcX")], "doc_id long, text string, source string"
        ))
    )
    fresh = export_shards(post, str(tmp_path / "fresh"), n_shards=8)
    assert fresh == manifest


def test_update_export_honesty_rules(spark, tmp_path):
    from cnics_to_fhir_spark.load.corpus_export import load_shard, update_export

    df = _docs(spark, n=60)
    path = str(tmp_path / "hr")
    export_shards(df, path, n_shards=4)

    with pytest.raises(ValueError, match="unknown change labels"):
        update_export(spark, path, spark.createDataFrame(
            [(1, "upsert", "x", "s")],
            "doc_id long, change string, text string, source string"))
    with pytest.raises(ValueError, match="insert\\(s\\) of keys already present"):
        update_export(spark, path, spark.createDataFrame(
            [(1, "insert", "x", "s")],
            "doc_id long, change string, text string, source string"))
    with pytest.raises(ValueError, match="changes columns"):
        update_export(spark, path, spark.createDataFrame(
            [(1, "update")], "doc_id long, change string"))

    # update/delete of absent keys: honest noop counts, nothing rewritten
    # beyond the hashed shards of those keys
    res = update_export(spark, path, spark.createDataFrame(
        [(7777, "update", "x", "s"), (8888, "delete", None, None)],
        "doc_id long, change string, text string, source string"))
    assert res["noop_missing_key"] == 2
    assert res["inserted"] == res["updated"] == res["deleted"] == 0
    verify_export(spark, path)

    # empty change feed: a clean no-op
    res = update_export(spark, path, spark.createDataFrame(
        [], "doc_id long, change string, text string, source string"))
    assert res["shards_rewritten"] == 0

    # deleting EVERY row of one shard: dir + manifest entry disappear,
    # verify still passes, load_shard refuses the now-absent shard
    m = verify_export(spark, path)
    victim = 0
    keys = [r["doc_id"] for r in load_shard(spark, path, victim).collect()]
    res = update_export(spark, path, spark.createDataFrame(
        [(k, "delete", None, None) for k in keys],
        "doc_id long, change string, text string, source string"))
    assert res["deleted"] == len(keys)
    m2 = verify_export(spark, path)
    assert str(victim) not in m2["shards"]
    assert not os.path.isdir(os.path.join(path, f"shard={victim}"))
    with pytest.raises(ValueError, match="not in the manifest"):
        load_shard(spark, path, victim)
