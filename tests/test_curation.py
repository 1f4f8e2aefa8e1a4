"""Curation-operator semantics on hand-checkable fixtures: benchmark
decontamination, PII redaction, repetition filters, hash splits."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cnics_to_fhir_spark.operators import curation, dataset, textanalysis


def test_decontaminate_flags_sources_and_copies(spark):
    corpus = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "one two three four five six seven eight nine ten"),  # dup of 1
            (3, "alpha beta gamma delta epsilon zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    # benchmark question excerpted from doc 1's first 8 words
    bench = spark.createDataFrame(
        [(900, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_hits"] for r in curation.decontaminate(corpus, bench, k=8).collect()}
    assert hits == {1: 1, 2: 1}  # the excerpt's single 8-gram hits both copies
    kept = sorted(r["doc_id"] for r in curation.drop_contaminated(corpus, bench, k=8).collect())
    assert kept == [3]


def test_decontaminate_no_self_flag(spark):
    # a benchmark row sharing the corpus id must not flag itself
    doc = [(7, "one two three four five six seven eight nine")]
    corpus = spark.createDataFrame(doc, "doc_id long, text string")
    bench = spark.createDataFrame(doc, "doc_id long, text string")
    assert curation.decontaminate(corpus, bench, k=8).count() == 0


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org or call 206-555-0199 now"),
            (2, "clean text with no pii at all"),
            (3, "not a phone 12-345-6789 and not an email a@b"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curation.pii_redact(df).collect()}
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL> or call <PHONE> now"
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[2]["redacted"] == "clean text with no pii at all"
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
    # word-boundary + shape guards: 2-3-4 digit groups only, tld required
    assert rows[3]["n_phones"] == 0 and rows[3]["n_emails"] == 0


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textanalysis.repetition_signals(df).collect()}
    # bigrams of doc 1: "a a" x3, "a b" x1 -> top 3/4
    assert abs(rows[1]["top_bigram_frac"] - 0.75) < 1e-9
    assert abs(rows[1]["dup_token_ratio"] - 0.6) < 1e-9  # 1 - 2/5
    assert rows[1]["repetitive"] is True
    # doc 2: all 5 bigrams unique -> 1/5 = 0.2, NOT > 0.2 -> clean
    assert abs(rows[2]["top_bigram_frac"] - 0.2) < 1e-9
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[2]["repetitive"] is False


def test_hash_split_deterministic_and_proportioned(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = dataset.hash_split(docs).collect()
    b = dataset.hash_split(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    splits = [r["split"] for r in a]
    n = len(splits)
    assert all(0 <= r["bucket"] < 100 for r in a)
    # 90/5/5 within rough binomial tolerance at n=500
    assert 0.8 < splits.count("train") / n < 0.97
    assert splits.count("val") / n < 0.12 and splits.count("test") / n < 0.12
    # membership is a pure function of the key: spot-check against the op
    one = dataset.hash_split(docs.limit(50)).collect()
    full = {r["doc_id"]: r["split"] for r in a}
    assert all(full[r["doc_id"]] == r["split"] for r in one)


def test_remove_boilerplate_chunks_semantics(spark):
    # chunk size 2 for hand-checkable fixtures; "b1 b2" repeats in 3 docs
    # (the min_docs threshold), "u* ..." chunks are unique.
    rows = [
        (1, "b1 b2 u1 u2"),
        (2, "b1 b2 u3 u4"),
        (3, "u5 u6 b1 b2"),
        (4, "b1 b2"),          # fully boilerplate -> empty clean_text
        (5, "solo"),           # shorter than k -> one whole-doc chunk
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in curation.remove_boilerplate_chunks(df, k=2, min_docs=3).collect()
    }
    assert len(out) == 5  # every doc survives as a row, even if emptied
    assert out[1]["clean_text"] == "u1 u2" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "u3 u4"
    assert out[3]["clean_text"] == "u5 u6"  # position order preserved
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
    assert out[5]["clean_text"] == "solo" and out[5]["n_removed"] == 0
    assert out[1]["n_chunks"] == 2 and out[5]["n_chunks"] == 1


def test_remove_boilerplate_preserves_chunk_order(spark):
    # 5 chunks at k=2, middle chunk boilerplate across 3 docs
    text = "a1 a2 HOT HOT b1 b2 c1 c2 d1"
    rows = [(1, text), (2, "HOT HOT x y"), (3, "z w HOT HOT")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in curation.remove_boilerplate_chunks(df, k=2, min_docs=3).collect()
    }
    assert out[1] == "a1 a2 b1 b2 c1 c2 d1"


def test_remove_boilerplate_noop_when_all_unique(spark):
    # with no repeated chunk, reassembly must reproduce the input exactly
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(11))) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curation.remove_boilerplate_chunks(df, k=4).collect()}
    for i, text in rows:
        assert out[i]["clean_text"] == text
        assert out[i]["n_removed"] == 0


def test_domain_cap_exact_and_accounted(spark):
    import pytest
    from pyspark.sql import functions as F
    from cnics_to_fhir_spark.operators.dedup import portable_hash

    # hot domain: 40 docs; small domain: 3 docs (under the cap of 5)
    rows = [(i, "hot") for i in range(40)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.domain_cap(df, cap=5).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    assert len(by_dom["hot"]) == 5 and len(by_dom["small"]) == 3
    assert {r["n_domain"] for r in by_dom["hot"]} == {40}
    assert {r["n_domain"] for r in by_dom["small"]} == {3}

    # two-phase selection ≡ the naive per-domain hash-ordered top-cap
    hashed = df.select(
        "doc_id", "source", portable_hash(F.col("doc_id").cast("string"), seed=73).alias("h")
    ).collect()
    hot_sorted = sorted(
        ((r["h"], r["doc_id"]) for r in hashed if r["source"] == "hot")
    )
    naive_keep = {doc for _, doc in hot_sorted[:5]}
    assert {r["doc_id"] for r in by_dom["hot"]} == naive_keep

    with pytest.raises(ValueError):
        curation.domain_cap(df, cap=0)


def test_domain_cap_cap_one(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    out = curation.domain_cap(df, cap=1).collect()
    assert sorted(r["source"] for r in out) == ["a", "b"]
    assert all(r["n_domain"] in (1, 2) for r in out)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=500), st.sampled_from("abc")),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=7),
)
def test_domain_cap_matches_naive_window_property(spark, rows, cap):
    """Two-phase cap ≡ naive per-domain hash-ordered top-cap for ANY id/domain
    distribution and cap — the provable-identity claim in domain_cap's
    docstring, checked by hypothesis (ids collide into the same top-10-bit
    bucket whenever the domain is small, so the cutoff-bucket path and the
    below-cutoff path both get exercised)."""
    from pyspark.sql import functions as F
    from cnics_to_fhir_spark.operators.dedup import portable_hash

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        (r["doc_id"], r["source"], r["n_domain"])
        for r in curation.domain_cap(df, cap=cap).collect()
    }

    hashed = df.select(
        "doc_id", "source", portable_hash(F.col("doc_id").cast("string"), seed=73).alias("h")
    ).collect()
    by_dom: dict[str, list[tuple[int, int]]] = {}
    for r in hashed:
        by_dom.setdefault(r["source"], []).append((r["h"], r["doc_id"]))
    want = {
        (doc, dom, len(items))
        for dom, items in by_dom.items()
        for _, doc in sorted(items)[:cap]
    }
    assert got == want


def test_k_anonymize_generalizes_small_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "a"),
            (2, "en", "a"),
            (3, "en", "a"),
            (4, "de", "b"),  # singleton tuple -> generalized
            (5, "en", "b"),  # ("en","b") n=2 < 3 -> generalized
            (6, "en", "b"),
        ],
        "doc_id long, lang string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in curation.k_anonymize(df, ["lang", "source"], k=3).collect()
    }
    assert len(out) == 6
    for i in (1, 2, 3):
        assert (out[i]["lang_k"], out[i]["source_k"]) == ("en", "a")
        assert out[i]["n_group"] == 3 and out[i]["is_anonymous"]
    for i in (4, 5, 6):
        assert (out[i]["lang_k"], out[i]["source_k"]) == ("*", "*")
        assert not out[i]["is_anonymous"]
    assert out[4]["n_group"] == 1 and out[5]["n_group"] == 2


def test_k_anonymize_tuple_not_column(spark):
    # every VALUE is common; only the combination (en, b) is rare — the
    # tuple, not the column, must drive suppression
    rows = [(i, "en", "a") for i in range(5)] + [(10 + i, "de", "b") for i in range(5)]
    rows.append((99, "en", "b"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {r["doc_id"]: r for r in curation.k_anonymize(df, ["lang", "source"], k=2).collect()}
    assert out[99]["lang_k"] == "*" and out[99]["source_k"] == "*"
    assert out[0]["lang_k"] == "en" and out[10]["lang_k"] == "de"


def test_k_anonymize_shuffle_form_matches_broadcast_form(spark):
    df = spark.createDataFrame(
        [(i, "l" + str(i % 3), "s" + str(i % 2)) for i in range(20)],
        "doc_id long, lang string, source string",
    )
    a = sorted(
        map(tuple, curation.k_anonymize(df, ["lang", "source"], k=4).collect())
    )
    b = sorted(
        map(
            tuple,
            curation.k_anonymize(
                df, ["lang", "source"], k=4, broadcast_counts=False
            ).collect(),
        )
    )
    assert a == b


def test_k_anonymize_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curation.k_anonymize(df, ["lang"], k=0)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300),
            st.sampled_from(["en", "de", "fr", None]),
            st.sampled_from(["s0", "s1", "s2", "s3", None]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),
)
def test_k_anonymize_property(spark, rows, k):
    """For any data and any k: (1) group counts are exact, (2) a group is
    generalized iff its count < k, (3) generalization is all-or-nothing
    per row, (4) no rows appear or vanish."""
    from collections import Counter

    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = curation.k_anonymize(df, ["lang", "source"], k=k).collect()
    truth = Counter((lang, src) for _, lang, src in rows)
    assert len(out) == len(rows)
    src_of = {i: (lang, src) for i, lang, src in rows}
    for r in out:
        tup = src_of[r["doc_id"]]
        n = truth[tup]
        assert r["n_group"] == n
        if n >= k:
            assert (r["lang_k"], r["source_k"]) == tup and r["is_anonymous"]
        else:
            assert (r["lang_k"], r["source_k"]) == ("*", "*") and not r["is_anonymous"]


def test_pseudonymize_is_consistent_across_docs_and_folds_multi_entity(spark):
    from cnics_to_fhir_spark.operators.curation import pseudonymize_entities

    df = spark.createDataFrame(
        [
            (1, "mail alice@x.com today"),
            (2, "cc alice@x.com and bob@y.org please"),  # two entities, one doc
            (3, "nothing to hide"),
            (4, "bob@y.org again bob@y.org"),  # repeated occurrence, one entity
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in pseudonymize_entities(
            df, pattern=r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        ).collect()
    }
    # dictionary ranks are lexicographic: alice@x.com → 1, bob@y.org → 2
    assert out[1]["redacted"] == "mail <EMAIL_1> today"
    assert out[2]["redacted"] == "cc <EMAIL_1> and <EMAIL_2> please"
    assert out[3]["redacted"] == "nothing to hide" and out[3]["n_entities"] == 0
    assert out[4]["redacted"] == "<EMAIL_2> again <EMAIL_2>"  # all occurrences
    assert out[2]["n_entities"] == 2


def test_semantic_decontaminate_flags_same_cell_hits_only(spark):
    from cnics_to_fhir_spark.operators.curation import semantic_decontaminate

    benchmark = spark.createDataFrame(
        [(100, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.05], 0),   # same cell, cosine ≈ 0.9988 → hit
            (2, [0.0, 1.0], 0),    # same cell, orthogonal → clean
            (3, [1.0, 0.0], 1),    # identical vector but OTHER cell → the
                                   # documented IVF recall trade: not flagged
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(corpus, benchmark, threshold=0.9).collect()
    }
    assert out[1]["is_contaminated"] and out[1]["n_benchmark_hits"] == 1
    assert out[1]["max_cosine_q"] is not None and out[1]["max_cosine_q"] > 0.99
    assert not out[2]["is_contaminated"] and out[2]["max_cosine_q"] is None
    assert not out[3]["is_contaminated"]
    assert len(out) == 3  # every corpus row stays visible


def test_pseudonymize_replaces_longest_entity_first(spark):
    """Containment hazard: replacing 'a@x.com' before 'na@x.com' rewrites
    the tail of the longer entity and destroys its token. Longest-first
    ordering is containment-safe."""
    from cnics_to_fhir_spark.operators.curation import pseudonymize_entities

    df = spark.createDataFrame(
        [(1, "na@x.com and a@x.com wrote")], "doc_id long, text string"
    )
    row = pseudonymize_entities(
        df, pattern=r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ).collect()[0]
    # ranks: a@x.com -> 1, na@x.com -> 2 (lexicographic dictionary)
    assert row["redacted"] == "<EMAIL_2> and <EMAIL_1> wrote"
    assert row["n_entities"] == 2


def test_l_diversify_homogeneity_gate(spark):
    """A k-large group with a homogeneous sensitive value suppresses the
    SENSITIVE column only; diverse groups pass through; all-NULL
    sensitives count as zero diversity (membership would still disclose
    'no value recorded' while the tuple isolates the group)."""
    import pytest

    from cnics_to_fhir_spark.operators.curation import l_diversify

    rows = [
        # group A: 3 rows, all sensitive 'x' -> homogeneous, suppress
        (1, "A", "x"), (2, "A", "x"), (3, "A", "x"),
        # group B: 2 distinct sensitive values -> diverse at l=2
        (4, "B", "x"), (5, "B", "y"),
        # group C: all NULL sensitive -> n_sensitive = 0, suppress
        (6, "C", None), (7, "C", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, sens string")
    out = {
        r["doc_id"]: r
        for r in l_diversify(
            df, quasi_cols=["grp"], sensitive_col="sens", l=2
        ).collect()
    }
    assert len(out) == 7  # no rows vanish
    assert all(out[i]["sens_l"] == "*" and not out[i]["is_diverse"] for i in (1, 2, 3))
    assert out[4]["sens_l"] == "x" and out[5]["sens_l"] == "y"
    assert out[4]["is_diverse"] and out[4]["n_sensitive"] == 2
    assert all(out[i]["sens_l"] == "*" and out[i]["n_sensitive"] == 0 for i in (6, 7))
    with pytest.raises(ValueError, match="l must be"):
        l_diversify(df, quasi_cols=["grp"], sensitive_col="sens", l=0)
