"""Sidecar name-mapping semantics (sources/evolution.py); the end-to-end
aggregate parity runs in the oracle (u04_rename_evolution_scan)."""

from __future__ import annotations

import os

import pytest

from cnics_to_fhir_spark.sources.evolution import (
    read_name_mapping,
    read_with_name_mapping,
    write_name_mapping,
)


def _write_gens(spark, root):
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, old_name string").coalesce(
        1
    ).write.parquet(os.path.join(root, "gen=1"))
    spark.createDataFrame([(3, "c", 9.0)], "id long, new_name string, extra double").coalesce(
        1
    ).write.parquet(os.path.join(root, "gen=2"))


def test_renamed_values_land_in_logical_column(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    _write_gens(spark, root)
    write_name_mapping(root, {"gen=1": {"old_name": "new_name"}})
    out = read_with_name_mapping(spark, root)
    rows = {r["id"]: r for r in out.collect()}
    # gen-1 values are visible under the NEW name, not NULL-shadowed
    assert rows[1]["new_name"] == "a" and rows[2]["new_name"] == "b"
    assert rows[3]["new_name"] == "c"
    # genuinely added column NULL-fills the old generation (u03 semantics)
    assert rows[1]["extra"] is None and rows[3]["extra"] == 9.0
    assert "old_name" not in out.columns


def test_mapping_naming_absent_column_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    _write_gens(spark, root)
    write_name_mapping(root, {"gen=1": {"typo_name": "new_name"}})
    with pytest.raises(ValueError, match="no 'typo_name'"):
        read_with_name_mapping(spark, root).collect()


def test_unmapped_generation_reads_identity(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    _write_gens(spark, root)
    write_name_mapping(root, {})
    out = read_with_name_mapping(spark, root)
    assert set(out.columns) == {"id", "old_name", "new_name", "extra"}
    assert read_name_mapping(root) == {}
