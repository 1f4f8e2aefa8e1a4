"""Annotation aggregation semantics (operators/labels.py) on hand-checkable
fixtures; the testdata-scale hash equivalence runs in the oracle
(lb01_majority_vote)."""

from __future__ import annotations

from datetime import datetime

from cnics_to_fhir_spark.operators.labels import majority_label


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _votes(spark, rows):
    return spark.createDataFrame(
        rows, "item_id long, annotator_id long, label string, ts timestamp, vote_id long"
    )


def test_majority_and_agreement_exact(spark):
    df = _votes(
        spark,
        [
            # item 1: a/a/b → winner a, 3 votes, pairs agreeing = 2·1+0 = 2 of 6
            (1, 10, "a", _ts("2024-01-01 00:00:00"), 1),
            (1, 11, "a", _ts("2024-01-01 00:00:00"), 2),
            (1, 12, "b", _ts("2024-01-01 00:00:00"), 3),
            # item 2: single vote → share 100%, pairwise NULL (not fake 100%)
            (2, 10, "c", _ts("2024-01-01 00:00:00"), 4),
        ],
    )
    out = {
        r["item_id"]: r
        for r in majority_label(
            df, ts_col="ts", vote_id_col="vote_id"
        ).collect()
    }
    i1 = out[1]
    assert (i1["winner_label"], i1["winner_votes"], i1["n_votes"], i1["n_labels"]) == ("a", 2, 3, 2)
    assert i1["winner_share_q"] == 666666  # 2/3 in micro-units, floor
    assert i1["pairwise_agree_q"] == 333333  # 2 agreeing pairs of 6 ordered
    i2 = out[2]
    assert (i2["winner_share_q"], i2["pairwise_agree_q"]) == (1000000, None)


def test_relabel_counts_once_with_latest_vote(spark):
    df = _votes(
        spark,
        [
            # annotator 10 flips a → b; only the LATEST (b) may count,
            # so b wins 2-1 over a despite three raw 'a' rows overall
            (1, 10, "a", _ts("2024-01-01 00:00:00"), 1),
            (1, 10, "b", _ts("2024-01-02 00:00:00"), 2),
            (1, 11, "b", _ts("2024-01-01 00:00:00"), 3),
            (1, 12, "a", _ts("2024-01-01 00:00:00"), 4),
        ],
    )
    row = majority_label(df, ts_col="ts", vote_id_col="vote_id").collect()[0]
    assert (row["winner_label"], row["winner_votes"], row["n_votes"]) == ("b", 2, 3)


def test_equal_ts_breaks_by_vote_id_then_tie_breaks_to_smallest_label(spark):
    df = _votes(
        spark,
        [
            # same annotator, same ts: higher vote_id ("z") is the kept vote
            (1, 10, "a", _ts("2024-01-01 00:00:00"), 1),
            (1, 10, "z", _ts("2024-01-01 00:00:00"), 2),
            # 1-1 tie between z and b → lexicographically smallest label wins
            (1, 11, "b", _ts("2024-01-01 00:00:00"), 3),
        ],
    )
    row = majority_label(df, ts_col="ts", vote_id_col="vote_id").collect()[0]
    assert row["winner_label"] == "b"
    assert row["n_votes"] == 2


def test_no_ts_mode_counts_every_row_as_one_vote(spark):
    df = _votes(
        spark,
        [
            (1, 10, "a", _ts("2024-01-01 00:00:00"), 1),
            (1, 11, "a", _ts("2024-01-02 00:00:00"), 2),
            (1, 12, "b", _ts("2024-01-01 00:00:00"), 3),
        ],
    ).selectExpr("item_id", "label")
    row = majority_label(df, ts_col=None).collect()[0]
    assert (row["winner_label"], row["winner_votes"], row["n_votes"]) == ("a", 2, 3)


def test_bradley_terry_two_player_fixed_point(spark):
    from cnics_to_fhir_spark.operators.labels import bradley_terry

    m = spark.createDataFrame(
        [("A", "B")] * 3 + [("B", "A")], "winner string, loser string"
    )
    out = {r["entity"]: r for r in bradley_terry(m, iters=4).collect()}
    # two-player BT fixed point: ratings proportional to win counts
    assert out["A"]["rating"] == 1_500_000
    assert out["B"]["rating"] == 500_000
    assert (out["A"]["wins"], out["A"]["games"]) == (3, 4)
    assert (out["B"]["wins"], out["B"]["games"]) == (1, 4)


def test_bradley_terry_matches_pure_python_mirror(spark):
    from cnics_to_fhir_spark.operators.labels import bradley_terry

    log = [
        ("A", "B"), ("A", "B"), ("B", "C"), ("C", "A"),
        ("B", "A"), ("A", "C"), ("A", "C"), ("C", "B"),
    ]
    out = {
        r["entity"]: r["rating"]
        for r in bradley_terry(
            spark.createDataFrame(log, "winner string, loser string"), iters=4
        ).collect()
    }

    from collections import Counter, defaultdict

    n = Counter()
    w = Counter()
    for a, b in log:
        n[(a, b)] += 1
        n[(b, a)] += 1
        w[a] += 1
    ents = sorted({e for p in n for e in p})
    s = {e: 1_000_000 for e in ents}
    SQ = 10**12
    for _ in range(4):
        d = defaultdict(int)
        for (i, j), nij in n.items():
            d[i] += nij * SQ // (s[i] + s[j])
        s = {e: (max(w[e] * SQ // d[e], 1) if d[e] > 0 else s[e]) for e in ents}
    assert out == s


def test_bradley_terry_winless_entity_floors_at_one_not_zero(spark):
    """A winless (or 1-win-in-millions) entity's rating truncates to 0
    without the floor — and two zero-rated opponents would divide by
    si+sj=0 the next iteration. The floor pins the minimum at 1
    micro-unit so the update stays total."""
    from cnics_to_fhir_spark.operators.labels import bradley_terry

    m = spark.createDataFrame(
        [("A", "Z"), ("B", "Z"), ("A", "B"), ("B", "A")],
        "winner string, loser string",
    )
    out = {r["entity"]: r for r in bradley_terry(m, iters=4).collect()}
    assert out["Z"]["rating"] == 1 and out["Z"]["wins"] == 0 and out["Z"]["games"] == 2


def test_bradley_terry_overflow_guard_raises(spark):
    import pytest

    from cnics_to_fhir_spark.operators.labels import bradley_terry

    m = spark.createDataFrame([("A", "B")], "winner string, loser string")
    with pytest.raises(ValueError, match="integer bound"):
        bradley_terry(m, scale=10**10)


def test_bradley_terry_guard_fires_on_real_win_counts(spark):
    """Actually cross the 9.2e6-wins bound at the default scale (2⁶³/10¹²
    ≈ 9.22e6) with COUNTS, not an inflated scale — deleting the guard
    would let W·scale² wrap silently with ANSI off."""
    import pytest
    from pyspark.sql import functions as F

    from cnics_to_fhir_spark.operators.labels import bradley_terry

    m = spark.range(9_300_000).select(
        F.lit("A").alias("winner"), F.lit("B").alias("loser")
    )
    with pytest.raises(ValueError, match="integer bound"):
        bradley_terry(m)


def test_bradley_terry_denominator_guard_fires(spark):
    """The denominator d_i = Σ_j n_ij·scale² DIV (si+sj) can wrap even when
    every per-pair count and per-entity win count passes: 3 opponents ×
    6.2e6 games each keeps max(n)=6.2e6 and max(w)=6.2e6 under the 9.22e6
    bound, but loser A's g=1.86e7 games put d_A's worst case (ratings
    floored to 1 ⇒ si+sj=2) at g·scale²/2 ≈ 9.3e18 > 2⁶³."""
    import pytest
    from pyspark.sql import functions as F

    from cnics_to_fhir_spark.operators.labels import bradley_terry

    per = 6_200_000
    m = None
    for winner in ("B", "C", "D"):
        part = spark.range(per).select(
            F.lit(winner).alias("winner"), F.lit("A").alias("loser")
        )
        m = part if m is None else m.unionByName(part)
    with pytest.raises(ValueError, match="per-entity games"):
        bradley_terry(m)


def test_fleiss_kappa_pe_decimal_path_fires_past_bigint(spark):
    """P̄_e's Σcl²·10⁶ product crosses 2⁶³ at ~3.04e6 single-label votes
    (cl²·10⁶ = 1.6e19 at 4e6 votes): without the DECIMAL(38,0) cast the
    BIGINT product wraps NEGATIVE with ANSI off and pe_q reads as junk.
    A 4e6-vote single-label campaign must still report pe_q = 10⁶ exactly
    (and kappa NULL — no chance-corrected signal)."""
    from pyspark.sql import functions as F

    from cnics_to_fhir_spark.operators.labels import fleiss_kappa

    votes = spark.range(4_000_000).select(
        (F.col("id") % 2_000_000).alias("item_id"),
        F.col("id").alias("annotator_id"),
        F.lit("a").alias("label"),
    )
    row = fleiss_kappa(votes).collect()[0]
    assert row["n_votes"] == 4_000_000
    assert row["po_q"] == 1_000_000
    assert row["pe_q"] == 1_000_000  # would be negative/wrapped without DECIMAL
    assert row["kappa_q"] is None


def test_annotator_reliability_leave_one_out(spark):
    """Hand-computed LOO agreement: the own vote never props up the
    majority it's graded against, single-voter items are excluded (not
    counted as trivial wins), and ties in the LOO panel break to the
    lexicographically smallest label."""
    from cnics_to_fhir_spark.operators.labels import annotator_reliability

    rows = [
        # item 1: A:x, B:x, C:y — LOO(A) = {x:1, y:1} -> tie -> 'x' (agree);
        # LOO(B) same (agree); LOO(C) = {x:2} -> 'x' (C voted y: disagree)
        (1, "A", "x"), (1, "B", "x"), (1, "C", "y"),
        # item 2: single voter D -> excluded entirely
        (2, "D", "z"),
        # item 3: A:y, C:y — both LOO panels are {y:1} -> agree
        (3, "A", "y"), (3, "C", "y"),
    ]
    df = spark.createDataFrame(rows, "item_id long, annotator_id string, label string")
    out = {
        r["annotator_id"]: (r["n_items"], r["n_agree"], r["agree_share_q"])
        for r in annotator_reliability(df).collect()
    }
    assert out == {
        "A": (2, 2, 1_000_000),
        "B": (1, 1, 1_000_000),
        "C": (2, 1, 500_000),
    }
    assert "D" not in out


def test_reliability_weighting_flips_a_bad_majority(spark):
    """Three unreliable annotators outvote two reliable ones 3-2; the
    Beta-smoothed LOO weights flip the winner. Hand-computed: after 8
    history items the good annotators carry w = (8+1)e6/(9+2) = 818181
    (they 'disagree' on the target itself — the LOO majority there is the
    bad label), the bad ones w = (1+1)e6/(4+2) = 333333 (their target
    vote AGREES with the LOO tie broken to 'bad'), so weighted scores are
    good 1636362 > bad 999999 while the raw count is 2 < 3."""
    from cnics_to_fhir_spark.operators.labels import reliability_weighted_labels

    rows = []
    for h in range(8):  # history: G1-G3 vote x, one B dissents with y
        for g in ("G1", "G2", "G3"):
            rows.append((h, g, "x"))
        rows.append((h, f"B{h % 3 + 1}", "y"))
    for b in ("B1", "B2", "B3"):
        rows.append((100, b, "bad"))
    for g in ("G1", "G2"):
        rows.append((100, g, "good"))
    df = spark.createDataFrame(rows, "item_id long, annotator_id string, label string")
    out = {r["item_id"]: r for r in reliability_weighted_labels(df).collect()}
    t = out[100]
    assert t["plain_label"] == "bad" and t["weighted_label"] == "good"
    assert t["changed"] and t["weighted_score"] == 1_636_362
    assert out[0]["weighted_label"] == "x" and not out[0]["changed"]


def test_fleiss_kappa_matches_hand_computation(spark):
    """Classic check: two items, 3 raters each.  Item 1: a/a/a (perfect),
    item 2: a/a/b.  Po = mean(1, 1/3) = 2/3; label totals over rated
    votes: a=5, b=1 of 6 -> Pe = (25+1)/36.  kappa = (Po-Pe)/(1-Pe)."""
    from cnics_to_fhir_spark.operators.labels import fleiss_kappa

    df = _votes(
        spark,
        [
            (1, 10, "a", _ts("2024-01-01 00:00:00"), 1),
            (1, 11, "a", _ts("2024-01-01 00:00:00"), 2),
            (1, 12, "a", _ts("2024-01-01 00:00:00"), 3),
            (2, 10, "a", _ts("2024-01-01 00:00:00"), 4),
            (2, 11, "a", _ts("2024-01-01 00:00:00"), 5),
            (2, 12, "b", _ts("2024-01-01 00:00:00"), 6),
            # singleton item: excluded from Po/Pe but counted in n_items
            (3, 10, "c", _ts("2024-01-01 00:00:00"), 7),
        ],
    )
    row = fleiss_kappa(df, ts_col="ts", vote_id_col="vote_id").collect()[0]
    assert (row["n_items"], row["n_rated_items"], row["n_votes"]) == (3, 2, 6)
    # per-item agreements: 1_000_000 and 2*1e6 DIV 6 = 333333; mean = 666666
    assert row["po_q"] == (1000000 + 333333) // 2
    assert row["pe_q"] == 26 * 1000000 // 36
    # TRUNCATING division (toward zero): Spark DIV and DuckDB // agree on
    # it for integers; python's // floors, hence int(a/b)-style mirror
    num = (row["po_q"] - row["pe_q"]) * 1000000
    den = 1000000 - row["pe_q"]
    expect_kappa = -((-num) // den) if num < 0 else num // den
    assert row["kappa_q"] == expect_kappa
    assert row["kappa_q"] < 0  # below-chance on this tiny fixture


def test_fleiss_kappa_single_label_campaign_is_null_not_zero(spark):
    from cnics_to_fhir_spark.operators.labels import fleiss_kappa

    df = _votes(
        spark,
        [
            (1, 10, "a", _ts("2024-01-01 00:00:00"), 1),
            (1, 11, "a", _ts("2024-01-01 00:00:00"), 2),
        ],
    )
    row = fleiss_kappa(df, ts_col="ts", vote_id_col="vote_id").collect()[0]
    assert row["pe_q"] == 1000000 and row["kappa_q"] is None


def test_dawid_skene_matches_pure_python_mirror(spark):
    """Full-row parity with an independent python mirror of the exact
    integer micro-nat arithmetic (collapse-free fixture: one vote per
    (item, annotator)), including a confusion-driven flip: annotator D
    systematically answers 'y' whatever the truth, so D's 'y' votes stop
    counting as evidence for 'y'."""
    import math
    from collections import Counter, defaultdict

    from cnics_to_fhir_spark.operators.labels import dawid_skene_relabel

    rows = []
    # items 0-5 truth 'x' (A,B,C vote x; D votes y); items 6-8 truth 'y'
    # (A,B,C vote y; D votes y)
    for i in range(6):
        rows += [(i, "A", "x"), (i, "B", "x"), (i, "C", "x"), (i, "D", "y")]
    for i in range(6, 9):
        rows += [(i, "A", "y"), (i, "B", "y"), (i, "C", "y"), (i, "D", "y")]
    # target: only B and D vote; plain majority ties y/x? B:x, D:y ->
    # tie breaks to 'x' lexicographically for majority; DS must also
    # weigh that D's 'y' is uninformative.
    rows += [(100, "B", "x"), (100, "D", "y")]

    df = spark.createDataFrame(rows, "item_id long, annotator_id string, label string")
    got = {r["item_id"]: r for r in dawid_skene_relabel(df).collect()}

    # --- python mirror ---
    votes = defaultdict(list)
    for item, a, l in rows:
        votes[item].append((a, l))
    hist = {i: Counter(l for _, l in v) for i, v in votes.items()}
    maj = {
        i: min(((-c, l) for l, c in h.items()))[1] for i, h in hist.items()
    }
    labels = sorted({l for _, _, l in rows})
    L = float(len(labels))
    conf = Counter()
    ctx = Counter()
    for i, v in votes.items():
        for a, l in v:
            conf[(a, maj[i], l)] += 1
            ctx[(a, maj[i])] += 1
    prior = Counter(maj.values())
    n_items = float(len(maj))
    expect = {}
    for i, v in votes.items():
        best = None
        for t in labels:
            cost = math.floor((math.log(n_items + L) - math.log(prior.get(t, 0) + 1.0)) * 1e6)
            for a, l in v:
                cost += math.floor(
                    (math.log(ctx.get((a, t), 0) + L) - math.log(conf.get((a, t, l), 0) + 1.0)) * 1e6
                )
            if best is None or (cost, t) < best:
                best = (cost, t)
        expect[i] = (best[1], best[0], maj[i], len(v), best[1] != maj[i])

    for i, (ds, cost, m, nv, ch) in expect.items():
        r = got[i]
        assert (
            r["ds_label"], r["ds_cost_q"], r["majority_label"], r["n_votes"], r["changed"]
        ) == (ds, cost, m, nv, ch), f"item {i}"
    # the flip actually happened: majority said 'x' (lex tie), DS agrees
    # with the informative voter B -> 'x', and D's 'y' carried ~no weight
    assert got[100]["majority_label"] == "x" and got[100]["ds_label"] == "x"
    # sanity: at least the mirror and engine agree everywhere (no flips
    # in this clean fixture beyond what the mirror predicts)
    assert all(got[i]["changed"] == expect[i][4] for i in expect)


def test_dawid_skene_converged_matches_iterated_python_mirror(spark):
    """The converged variant parity-checked against the SAME python mirror
    iterated to the label fixpoint with the identical adopt-only-if-changed
    rule — labels, costs, AND the converged iteration count."""
    import math
    from collections import Counter, defaultdict

    import pytest

    from cnics_to_fhir_spark.operators.labels import dawid_skene_converged

    rows = []
    for i in range(6):
        rows += [(i, "A", "x"), (i, "B", "x"), (i, "C", "x"), (i, "D", "y")]
    for i in range(6, 9):
        rows += [(i, "A", "y"), (i, "B", "y"), (i, "C", "y"), (i, "D", "y")]
    rows += [(100, "B", "x"), (100, "D", "y")]
    # a noisy block that takes more than one step to settle: E and G are
    # half-informative, so the first relabel shifts the estimate they are
    # conditioned on and step 2 can flip again
    for i in range(200, 206):
        rows += [(i, "E", "x" if i % 2 else "y"), (i, "G", "y"), (i, "A", "x")]

    df = spark.createDataFrame(rows, "item_id long, annotator_id string, label string")
    got = {r["item_id"]: r for r in dawid_skene_converged(df).collect()}

    # --- python mirror, iterated ---
    votes = defaultdict(list)
    for item, a, l in rows:
        votes[item].append((a, l))
    hist = {i: Counter(l for _, l in v) for i, v in votes.items()}
    assign = {
        i: min(((-c, l) for l, c in h.items()))[1] for i, h in hist.items()
    }
    labels = sorted({l for _, _, l in rows})
    L = float(len(labels))
    n_items = float(len(assign))

    def em(cur):
        conf, ctx = Counter(), Counter()
        for i, v in votes.items():
            for a, l in v:
                conf[(a, cur[i], l)] += 1
                ctx[(a, cur[i])] += 1
        prior = Counter(cur.values())
        out = {}
        for i, v in votes.items():
            best = None
            for t in labels:
                cost = math.floor(
                    (math.log(n_items + L) - math.log(prior.get(t, 0) + 1.0)) * 1e6
                )
                for a, l in v:
                    cost += math.floor(
                        (math.log(ctx.get((a, t), 0) + L)
                         - math.log(conf.get((a, t, l), 0) + 1.0)) * 1e6
                    )
                if best is None or (cost, t) < best:
                    best = (cost, t)
            out[i] = best
        return out

    state = em(assign)  # step 1, unconditional
    iters = 1
    for k in range(2, 51):
        new = em({i: lc[1] for i, lc in state.items()})
        if all(new[i][1] == state[i][1] for i in state):
            break
        state = new
        iters = k

    for i, (cost, lab) in state.items():
        r = got[i]
        assert (r["ds_label"], r["ds_cost_q"], r["iters"]) == (lab, cost, iters), (
            f"item {i}: {r} vs {(lab, cost, iters)}"
        )
    maj = {i: min(((-c, l) for l, c in h.items()))[1] for i, h in hist.items()}
    assert all(got[i]["changed"] == (state[i][1] != maj[i]) for i in state)

    # non-convergence is a loud error, not a silent cap
    with pytest.raises(RuntimeError, match="did not converge"):
        dawid_skene_converged(df, max_iters=1) if iters > 1 else (_ for _ in ()).throw(
            RuntimeError("did not converge (fixture converged in 1 step)")
        )
