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


def test_mad_outliers_hand_computed(spark):
    # group 'a': values [1, 1, 2, 9] → n=4, target rank (4+1)//2 = 2 →
    # lower median = 1; deviations [0, 0, 1, 8] → MAD = 0 (rank-2 of the
    # deviation histogram); outliers = every value with |v-1| > 0 → 2 rows.
    # group 'b': [10, 12, 14] → median 12, deviations [2, 0, 2] → MAD = 2,
    # |v-12| > 6 never → 0 outliers.
    from cnics_to_fhir_spark.operators.drift import mad_outliers

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 9.0),
         ("b", 10.0), ("b", 12.0), ("b", 14.0)],
        "grp string, v double",
    )
    rows = {r["grp"]: r for r in mad_outliers(df, "v", "grp").collect()}
    assert rows["a"]["median"] == 1.0 and rows["a"]["mad"] == 0.0
    assert rows["a"]["n_outliers"] == 2 and rows["a"]["n_values"] == 4
    assert rows["b"]["median"] == 12.0 and rows["b"]["mad"] == 2.0
    assert rows["b"]["n_outliers"] == 0 and rows["b"]["n_values"] == 3


def test_mad_outliers_matches_naive_definition(spark):
    # Against the straight definition computed in Python on a pseudo-random
    # (seeded, engine-independent) sample: lower-median by sort.
    import hashlib

    from cnics_to_fhir_spark.operators.drift import mad_outliers

    vals = []
    for i in range(501):
        h = int(hashlib.md5(f"mad{i}".encode()).hexdigest()[:8], 16)
        vals.append(("g", round((h % 10000) / 100.0, 2)))
    df = spark.createDataFrame(vals, "grp string, v double")

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    med = lower_median([v for _, v in vals])
    mad = lower_median([abs(v - med) for _, v in vals])
    n_out = sum(1 for _, v in vals if abs(v - med) > 3.0 * mad)
    row = mad_outliers(df, "v", "grp").collect()[0]
    assert row["median"] == med
    assert abs(row["mad"] - mad) < 1e-9
    assert row["n_outliers"] == n_out


def test_ks_drift_ignores_null_values(spark):
    # NULL observations carry no ECDF position and Spark/DuckDB disagree on
    # default null ordering (Spark first-ascending, DuckDB last), so ks_drift
    # must drop them from BOTH the cumulative counts and the group totals —
    # the score with NULLs present must equal the score on the non-null rows.
    from cnics_to_fhir_spark.operators.drift import ks_drift

    clean = [("g", 1.0, True), ("g", 2.0, True), ("g", 2.0, False), ("g", 3.0, False)]
    noisy = clean + [("g", None, True), ("g", None, False), ("g", None, False)]
    schema = "grp string, v double, is_base boolean"

    def score(rows):
        df = spark.createDataFrame(rows, schema)
        [r] = ks_drift(df, value_col="v", group_col="grp", baseline_col="is_base").collect()
        return (r["n_base"], r["n_new"], r["ks_q"])

    assert score(noisy) == score(clean) == (2, 2, 500000)


def test_ks_drift_all_null_group_dropped(spark):
    from cnics_to_fhir_spark.operators.drift import ks_drift

    rows = [("g", None, True), ("g", None, False)]
    df = spark.createDataFrame(rows, "grp string, v double, is_base boolean")
    assert ks_drift(df, value_col="v", group_col="grp", baseline_col="is_base").count() == 0


def test_embedding_mean_shift_hand_computed(spark):
    # label 'x': snapshot A (even ids) vectors [1.0, 0.0] and [3.0, 0.0]
    #   -> quantized sums sa = (1e6 + 3e6, 0), ca = 2
    # snapshot B (odd ids) vector [1.0, 4.0] -> sb = (1e6, 4e6), cb = 1
    # dim0 shift = |4e6*1 - 1e6*2| / 2 = 1_000_000; dim1 = |0 - 8e6|/2 = 4e6
    # linf = 4e6, l1 = 5e6
    from cnics_to_fhir_spark.operators.drift import embedding_mean_shift

    df = spark.createDataFrame(
        [
            (0, "x", [1.0, 0.0]),
            (2, "x", [3.0, 0.0]),
            (1, "x", [1.0, 4.0]),
            (5, "y", [1.0, 1.0]),  # one-sided label: dropped
        ],
        "vec_id long, label string, embedding array<double>",
    )
    rows = embedding_mean_shift(df, group_col="label").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["label"], r["n_a"], r["n_b"]) == ("x", 2, 1)
    assert r["linf_shift_q"] == 4_000_000
    assert r["l1_shift_q"] == 5_000_000
