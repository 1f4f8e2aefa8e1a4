"""version_diff classification semantics on a four-action fixture (the PSI
operator itself is oracle-pinned via dq01/dq02)."""

from __future__ import annotations

from cnics_to_fhir_spark.operators.drift import version_diff


def test_version_diff_all_four_actions(spark):
    old = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(1, "aa"), (2, "BB"), (4, "dd")], "doc_id long, fp string"
    )
    got = {
        r["doc_id"]: r["action"]
        for r in version_diff(old, new, id_col="doc_id", fingerprint_col="fp").collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
