from __future__ import annotations

from pyspark.sql import functions as F

from cnics_to_fhir_spark.operators import textanalysis as tx


def test_profile_basics(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "el perro de la casa y el gato")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in tx.profile(df).collect()}
    assert out[1]["n_tokens"] == 5
    assert out[1]["n_distinct_tokens"] == 4
    assert out[1]["lang_guess"] == "en"
    assert out[2]["lang_guess"] == "es"
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO WORLD ")],
        ["doc_id", "text"],
    )
    fps = [r["fp"] for r in df.select(tx.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_token_count_empty(spark):
    df = spark.createDataFrame([("",), ("one",)], ["text"])
    out = [r["n"] for r in df.select(tx.token_count(F.col("text")).alias("n")).collect()]
    assert out == [0, 1]


def test_lang_id_unknown(spark):
    df = spark.createDataFrame([("xyzzy plugh quux",)], ["text"])
    out = df.select(tx.lang_id(F.col("text")).alias("lg")).collect()
    assert out[0]["lg"] == "unk"


def test_bpe_tokens_split_classes(spark):
    df = spark.createDataFrame([("ab12-cd e",)], ["text"])
    out = df.select(tx.bpe_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert out == ["ab", "12", "-", "cd", "e"]


def test_poly_hash_matches_python_reference(spark):
    def ref(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * tx.POLY_BASE + ord(ch)) % tx.POLY_MOD
        return h

    texts = ["abc", "hello world", "", "a" * 50]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    out = [r["h"] for r in df.select(tx.poly_hash(F.col("text")).alias("h")).collect()]
    assert out == [ref(t) for t in texts]


def test_rolling_fingerprint_stable_under_tail_edit(spark):
    # winnowing min: editing one word far from the minimal shingle usually
    # keeps the fingerprint; identical docs always match
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "completely different text here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["fp"] for r in df.select("doc_id", tx.rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_unigram_surprise_orders_rarity(spark):
    """Docs made of rare tokens score strictly higher surprise than docs of
    common tokens; totals are exact integers."""
    from cnics_to_fhir_spark.operators.textanalysis import unigram_surprise

    rows = [
        (1, "common common common common"),
        (2, "common common common common"),
        (3, "common common common common"),
        (4, "rare1 rare2 rare3 rare4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_surprise(df).collect()}
    assert out[4]["avg_nll_q"] > out[1]["avg_nll_q"]
    assert out[1]["avg_nll_q"] == out[2]["avg_nll_q"] == out[3]["avg_nll_q"]
    import math
    # 16 tokens total, 'common' appears 12x -> surprise floor(ln(16/12)*1e6)
    assert out[1]["avg_nll_q"] == math.floor((math.log(16) - math.log(12)) * 1e6)
    assert out[4]["n_tokens"] == 4 and out[4]["sum_nll_q"] == 4 * out[4]["avg_nll_q"]


def test_bigram_surprise_hand_computed_and_repetition(spark):
    """Hand-computed micro-nats for a tiny corpus, plus the property the
    bigram model exists for: a doc repeating a COMMON token scores high
    conditional surprise when its transitions are rare corpus-wide, and
    sub-2-token docs get no row (no fake scores)."""
    import math

    from cnics_to_fhir_spark.operators.textanalysis import bigram_surprise

    rows = [(1, "a b a b a b"), (2, "a c"), (3, "solo")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_surprise(df).collect()}
    # V=4 (a,b,c,solo); c(a,b)=3, c(b,a)=2, c(a,c)=1; cp(a)=4, cp(b)=2
    ab = math.floor((math.log(4 + 4) - math.log(3 + 1)) * 1e6)
    ba = math.floor((math.log(2 + 4) - math.log(2 + 1)) * 1e6)
    ac = math.floor((math.log(4 + 4) - math.log(1 + 1)) * 1e6)
    assert out[1]["n_bigrams"] == 5
    assert out[1]["sum_nll2_q"] == 3 * ab + 2 * ba
    assert out[1]["avg_nll2_q"] == (3 * ab + 2 * ba) // 5
    assert out[2]["sum_nll2_q"] == ac
    assert 3 not in out  # one token -> no transitions -> no row

    # repetition: 'the the the the' among docs where 'the' is common but
    # the the->the transition occurs only there
    corpus = [(i, "the quick fox") for i in range(10)] + [(99, "the the the the")]
    df2 = spark.createDataFrame(corpus, ["doc_id", "text"])
    out2 = {r["doc_id"]: r for r in bigram_surprise(df2).collect()}
    assert out2[99]["avg_nll2_q"] > out2[0]["avg_nll2_q"]


def test_bpe_learn_merges_hand_computed(spark):
    """'low low lower aaaa': round-1 pairs tie at 3 ((a,a),(l,o),(o,w)) →
    lexicographic tiebreak picks (a,a); greedy application then leaves
    only ONE aa-aa pair in 'aaaa' (non-overlapping), so round 2 is (l,o)
    and round 3 the merged symbol ('lo','w') — the classic BPE trajectory,
    deterministic across engines."""
    from cnics_to_fhir_spark.operators.textanalysis import bpe_learn_merges

    df = spark.createDataFrame([(1, "low low lower aaaa")], "doc_id long, text string")
    got = [
        (r["merge_round"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_learn_merges(df, n_merges=3).orderBy("merge_round").collect()
    ]
    assert got == [(1, "a", "a", 3), (2, "l", "o", 3), (3, "lo", "w", 3)]


def test_bpe_single_char_words_no_pairs(spark):
    from cnics_to_fhir_spark.operators.textanalysis import bpe_learn_merges

    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    # no word has 2+ symbols → no pairs → zero merges learned
    assert bpe_learn_merges(df, n_merges=3).count() == 0


def test_nb_langid_learns_separable_signal(spark):
    from cnics_to_fhir_spark.operators.textanalysis import nb_langid

    # Strongly separable vocabularies; ids chosen so each lang appears in
    # both the train (id % 5 != 0) and test (id % 5 == 0) splits.
    rows = []
    for base, (lang, words) in enumerate(
        [("en", "the cat sat on the mat"), ("es", "el gato se sienta en la estera")]
    ):
        for i in range(10):
            rows.append((base * 10 + i, words, lang))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = nb_langid(df).collect()
    assert len(out) == 4  # ids 0,5 (en) and 10,15 (es)
    assert all(r["correct"] for r in out)
    preds = {r["doc_id"]: r["pred_lang"] for r in out}
    assert preds[0] == "en" and preds[10] == "es"


def test_bpe_encode_counts_shrinks_tokens(spark):
    from cnics_to_fhir_spark.operators.textanalysis import bpe_encode_counts

    # 'aaaa' dominates: merges learn (a,a) then (aa,aa) etc.; encoded
    # length must drop below character count but never below 1 per word.
    rows = [(i, "aaaa bb aaaa aaaa cd") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bpe_encode_counts(df, n_merges=3).collect()}
    r = out[0]
    assert r["n_words"] == 5
    chars = 4 + 2 + 4 + 4 + 2  # pre-merge symbol count
    assert r["n_bpe_tokens"] < chars
    assert r["n_bpe_tokens"] >= r["n_words"]


def test_nb_langid_beats_majority_prior_on_separable_fixture(spark):
    """Adversarial pin (verdict r5 #7): the driver-corpus accuracy of tx09
    approximates the majority prior because synthetic docs share
    vocabulary across langs. This fixture is SEPARABLE — three languages
    with disjoint vocabularies, 60/20/20 class skew — so a
    majority-prior classifier scores exactly 0.6 on the held-out split
    while a working NB must exploit the likelihoods: accuracy pinned
    >= 0.9 and > prior + 0.25."""
    from cnics_to_fhir_spark.operators.textanalysis import nb_langid

    vocab = {
        "aa": ["alpha", "apple", "anchor", "arrow", "amber", "atlas"],
        "bb": ["bravo", "berry", "basket", "bridge", "border", "binary"],
        "cc": ["charlie", "cherry", "candle", "copper", "canyon", "circle"],
    }
    rows = []
    for i in range(50):
        # 60/20/20 skew assigned per 5-id BLOCK (i//5), never per i%5 —
        # the held-out split is id%5==0, so any function of i%5 would
        # collapse the test set to one class. Test ids 0,5,...,45 see
        # blocks 0..9 → 6 aa / 2 bb / 2 cc, same ratio as the corpus.
        lang = ("aa", "aa", "aa", "bb", "cc")[(i // 5) % 5]
        toks = [vocab[lang][(i + j) % 6] for j in range(6)]
        rows.append((i, " ".join(toks), lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_langid(df)
    res = out.collect()
    assert len(res) == 10  # ids 0..45 step 5
    acc = sum(1 for r in res if r["correct"]) / len(res)
    prior = sum(1 for r in res if r["lang"] == "aa") / len(res)
    assert prior == 0.6  # the fixture's skew landed as designed
    assert acc >= 0.9, f"NB accuracy {acc} on a separable corpus"
    assert acc > prior + 0.25, f"NB {acc} does not beat the prior {prior}"


def _zipf_mirror(rank_freqs):
    """Pure-python mirror of zipf_fit's integer-exact regression."""
    import math

    pts = [
        (math.floor(math.log(r) * 1e6 + 0.5), math.floor(math.log(c) * 1e6 + 0.5))
        for r, c in rank_freqs
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    return (
        math.floor(slope * 1e6 + 0.5) / 1e6,
        math.floor(intercept * 1e6 + 0.5) / 1e6,
    )


def test_zipf_fit_matches_pure_python_mirror(spark):
    freqs = [32, 16, 8, 4, 2, 1]
    text = " ".join(f"w{i}" for i, c in enumerate(freqs) for _ in range(c))
    df = spark.createDataFrame(
        [(1, text, "en")], "doc_id long, text string, lang string"
    )
    out = tx.zipf_fit(df, top_n=4).collect()
    assert len(out) == 1
    r = out[0]
    exp_slope, exp_intercept = _zipf_mirror([(i + 1, freqs[i]) for i in range(4)])
    assert r["n_ranks"] == 4  # the top_n cut applied
    assert r["slope"] == exp_slope
    assert r["intercept"] == exp_intercept
    assert r["slope"] < 0  # Zipf: frequency falls with rank


def test_zipf_fit_groups_are_independent(spark):
    en = " ".join(["the"] * 9 + ["of"] * 3 + ["and"] * 1)
    de = " ".join(["der"] * 4 + ["die"] * 2)
    df = spark.createDataFrame(
        [(1, en, "en"), (2, de, "de")], "doc_id long, text string, lang string"
    )
    out = {r["lang"]: r for r in tx.zipf_fit(df, top_n=100).collect()}
    assert set(out) == {"en", "de"}
    assert out["en"]["n_ranks"] == 3 and out["de"]["n_ranks"] == 2
    s_en, i_en = _zipf_mirror([(1, 9), (2, 3), (3, 1)])
    s_de, i_de = _zipf_mirror([(1, 4), (2, 2)])
    assert out["en"]["slope"] == s_en and out["en"]["intercept"] == i_en
    assert out["de"]["slope"] == s_de and out["de"]["intercept"] == i_de


def test_zipf_fit_drops_degenerate_groups(spark):
    # a single-rank group has zero x-variance: no fit line exists, and the
    # operator must drop it rather than divide by zero
    df = spark.createDataFrame(
        [(1, "only only only", "xx")], "doc_id long, text string, lang string"
    )
    assert tx.zipf_fit(df).count() == 0


def test_zipf_fit_random_corpora_match_mirror(spark):
    """Seeded sweep: zipf_fit ≡ the pure-python mirror for random token
    multisets — exercises rank ties (equal counts), the top_n cut landing
    mid-tie, and single-doc vs multi-doc token splits."""
    import random
    from collections import Counter

    rnd = random.Random(99)
    for trial in range(3):
        vocab = [f"t{j}" for j in range(rnd.randint(2, 12))]
        toks = [rnd.choice(vocab) for _ in range(rnd.randint(10, 200))]
        # split the stream into 1-4 documents: per-doc boundaries must not
        # affect corpus-level frequencies
        n_docs = rnd.randint(1, 4)
        docs, step = [], max(1, len(toks) // n_docs)
        for d in range(n_docs):
            chunk = toks[d * step : (d + 1) * step] if d < n_docs - 1 else toks[(n_docs - 1) * step :]
            if chunk:
                docs.append((d, " ".join(chunk), "xx"))
        top_n = rnd.randint(2, 8)
        out = tx.zipf_fit(
            spark.createDataFrame(docs, "doc_id long, text string, lang string"),
            top_n=top_n,
        ).collect()
        counts = Counter(toks)
        ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:top_n]
        if len(ranked) < 2:
            assert out == []  # single rank: zero x-variance, no fit line
            continue
        exp_slope, exp_intercept = _zipf_mirror(
            [(i + 1, c) for i, (_, c) in enumerate(ranked)]
        )
        # a corpus where every point has identical ln(rank) has den==0 and
        # is dropped; ranks 1..n are distinct so den>0 whenever n>=2
        assert len(out) == 1, f"trial {trial}"
        assert out[0]["slope"] == exp_slope and out[0]["intercept"] == exp_intercept


def test_tfidf_hashed_matches_pure_python_mirror(spark):
    """Exact weights vs an out-of-band python mirror of the same
    tf·idf_q arithmetic and md5-prefix feature hashing."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from cnics_to_fhir_spark.operators.textanalysis import tfidf_hashed

    corpus = [
        (1, "a b a c"),
        (2, "a b"),
        (3, "c c d"),
        (4, ""),  # empty doc contributes no rows but counts toward N
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_id"], r["dim"]): r["weight_q"]
        for r in tfidf_hashed(df, dims=8).collect()
    }

    n_docs = len(corpus)
    tf = {doc: Counter(t for t in text.split(" ") if t) for doc, text in corpus}
    dfreq = Counter(tok for c in tf.values() for tok in c)
    want = defaultdict(int)
    for doc, counts in tf.items():
        for tok, k in counts.items():
            idf_q = math.floor(
                math.log((n_docs + 1) / (dfreq[tok] + 1)) * 1e6 + 0.5
            )
            dim = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8
            want[(doc, dim)] += k * idf_q
    assert got == dict(want)
