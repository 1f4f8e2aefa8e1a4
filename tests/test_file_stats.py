"""Footer-stats file skipping (sources/file_stats.py): manifest correctness,
envelope pruning, stat-less files never skipped, and result equivalence with
the unpruned scan."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cnics_to_fhir_spark.sources.file_stats import (
    parquet_file_stats,
    read_with_file_skipping,
)


def _write_ranged(spark, path, n=100, files=5):
    (
        spark.range(n)
        .select(
            F.col("id"),
            F.format_string("k%05d", F.col("id")).alias("key"),
        )
        .repartitionByRange(files, "key")
        .write.mode("overwrite")
        .parquet(path)
    )


def test_manifest_rows_and_envelopes(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_ranged(spark, path)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    man = parquet_file_stats(spark, files, "key").collect()
    assert len(man) == len(files) == 5
    assert sum(r["n_rows"] for r in man) == 100
    for r in man:
        assert r["min_val"] <= r["max_val"]
    # range layout => disjoint envelopes when sorted by min
    envs = sorted((r["min_val"], r["max_val"]) for r in man)
    for (_, hi_prev), (lo_next, _) in zip(envs, envs[1:]):
        assert hi_prev < lo_next


def test_skipping_prunes_and_matches_full_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_ranged(spark, path)
    df, total, kept = read_with_file_skipping(spark, path, "key", "k00010", "k00019")
    assert total == 5
    assert 0 < kept < total  # the prune actually pruned
    got = sorted(r["key"] for r in df.collect())
    full = sorted(
        r["key"]
        for r in spark.read.parquet(path)
        .filter(F.col("key").between("k00010", "k00019"))
        .collect()
    )
    assert got == full and len(got) == 10


def test_empty_range_keeps_nothing_and_returns_empty(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_ranged(spark, path)
    df, total, kept = read_with_file_skipping(spark, path, "key", "zzz1", "zzz2")
    assert kept == 0 and total == 5
    assert df.count() == 0
    assert df.columns == ["id", "key"]  # schema survives the empty prune


def test_statless_file_is_never_skipped(spark, tmp_path):
    # a writer that omits column statistics must degrade to "always read",
    # never to "silently skip"
    path = str(tmp_path / "t")
    os.makedirs(path)
    tbl = pa.table({"key": ["a", "b"], "id": [1, 2]})
    pq.write_table(tbl, os.path.join(path, "part-0.parquet"), write_statistics=False)
    files = glob.glob(os.path.join(path, "*.parquet"))
    man = parquet_file_stats(spark, files, "key").collect()
    assert man[0]["min_val"] is None and man[0]["max_val"] is None
    df, total, kept = read_with_file_skipping(spark, path, "key", "x", "z")
    assert kept == total == 1  # out-of-range but stat-less: kept
    assert df.count() == 0  # the residual filter still applies


def test_missing_column_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_ranged(spark, path)
    files = glob.glob(os.path.join(path, "*.parquet"))
    import pytest

    with pytest.raises(Exception, match="absent"):
        parquet_file_stats(spark, files, "nope").collect()


def test_skipping_equals_full_scan_on_random_layouts(spark, tmp_path):
    """Property (seeded sweep): for ANY file layout — sorted, random,
    overlapping envelopes — pruned-read + residual filter must equal the
    full-scan filter.  Random layouts produce overlapping per-file
    envelopes, the case where pruning keeps everything; sorted layouts
    produce disjoint ones, where it prunes hard.  Both must be CORRECT."""
    import random

    from pyspark.sql import Row

    rnd = random.Random(41)
    for trial, shuffle in enumerate([False, True, True]):
        path = str(tmp_path / f"t{trial}")
        keys = [f"k{rnd.randint(0, 999):04d}" for _ in range(200)]
        rows = [Row(id=i, key=k) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows)
        writer = df.repartition(7) if shuffle else df.repartitionByRange(7, "key")
        writer.write.mode("overwrite").parquet(path)
        lo, hi = sorted([f"k{rnd.randint(0, 999):04d}" for _ in range(2)])
        pruned, total, kept = read_with_file_skipping(spark, path, "key", lo, hi)
        got = sorted((r["id"], r["key"]) for r in pruned.collect())
        want = sorted((i, k) for i, k in enumerate(keys) if lo <= k <= hi)
        assert got == want, f"trial {trial} (shuffle={shuffle}) lo={lo} hi={hi}"
        assert 0 <= kept <= total == 7


def test_numeric_stats_compare_as_numbers(spark, tmp_path):
    """The '9' > '10' trap: an int64 stat column must prune numerically.
    File A holds ids 5..9, file B holds ids 10..14; the range [9, 10]
    intersects BOTH, but lexicographic comparison would drop file B
    (min '10' < lo '9' reads as out-of-range-above on max '14' < '9')."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    pq.write_table(pa.table({"id": list(range(5, 10))}), os.path.join(path, "a.parquet"))
    pq.write_table(pa.table({"id": list(range(10, 15))}), os.path.join(path, "b.parquet"))
    df, total, kept = read_with_file_skipping(spark, path, "id", 9, 10)
    assert total == 2 and kept == 2  # both intersect [9, 10]
    assert sorted(r["id"] for r in df.collect()) == [9, 10]
    # and numeric pruning still actually prunes when it should
    df2, total2, kept2 = read_with_file_skipping(spark, path, "id", 12, 14)
    assert kept2 == 1
    assert sorted(r["id"] for r in df2.collect()) == [12, 13, 14]


def test_numeric_manifest_rejects_string_bounds(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    os.makedirs(path)
    pq.write_table(pa.table({"id": [1, 2, 3]}), os.path.join(path, "a.parquet"))
    with pytest.raises(TypeError, match="numeric"):
        read_with_file_skipping(spark, path, "id", "abc", "def")


def test_persisted_manifest_multi_column_skipping(spark, tmp_path):
    """Million-file tier: manifest persisted as parquet once, query-time
    pruning is a distributed filter joined over (file, col) rows with a
    conjunctive multi-column predicate; result equals the full scan."""
    from cnics_to_fhir_spark.sources.file_stats import (
        read_with_manifest_skipping,
        write_stats_manifest,
    )

    path = str(tmp_path / "t")
    man_path = str(tmp_path / "man")
    (
        spark.range(100)
        .select(
            F.col("id"),
            F.format_string("k%05d", F.col("id")).alias("key"),
        )
        .repartitionByRange(5, "id")
        .write.mode("overwrite")
        .parquet(path)
    )
    n = write_stats_manifest(spark, path, ["id", "key"], man_path)
    assert n == 5
    df, total, kept = read_with_manifest_skipping(
        spark, man_path, {"id": (10, 19), "key": ("k00000", "k00015")}
    )
    assert total == 5 and 0 < kept < total
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(10, 16))  # intersection of both ranges


def test_persisted_manifest_empty_result(spark, tmp_path):
    from cnics_to_fhir_spark.sources.file_stats import (
        read_with_manifest_skipping,
        write_stats_manifest,
    )

    path = str(tmp_path / "t")
    man_path = str(tmp_path / "man")
    spark.range(50).write.mode("overwrite").parquet(path)
    write_stats_manifest(spark, path, ["id"], man_path)
    df, total, kept = read_with_manifest_skipping(spark, man_path, {"id": (999, 1000)})
    assert kept == 0
    assert df.count() == 0
    assert df.columns == ["id"]


def test_manifest_skipping_refuses_absent_predicate_column(spark, tmp_path):
    import pytest

    from cnics_to_fhir_spark.sources.file_stats import (
        read_with_manifest_skipping,
        write_stats_manifest,
    )

    data, man = str(tmp_path / "d"), str(tmp_path / "m")
    spark.createDataFrame([(1, "a")], "k long, s string").coalesce(1).write.parquet(data)
    write_stats_manifest(spark, data, ["k"], man)
    with pytest.raises(ValueError, match="no stats for predicate"):
        read_with_manifest_skipping(spark, man, {"k": (0, 9), "s": ("a", "z")})


def test_manifest_skipping_refuses_raw_binary_stats(spark, tmp_path):
    import pytest

    from cnics_to_fhir_spark.sources.file_stats import (
        read_with_manifest_skipping,
        write_stats_manifest,
    )

    data, man = str(tmp_path / "d"), str(tmp_path / "m")
    spark.createDataFrame(
        [(1, bytearray(b"\xff\xfe")), (2, bytearray(b"\x00\x01"))],
        "k long, b binary",
    ).coalesce(1).write.parquet(data)
    write_stats_manifest(spark, data, ["b"], man)
    with pytest.raises(TypeError, match="non-UTF-8 binary"):
        read_with_manifest_skipping(spark, man, {"b": ("a", "z")})
