"""Property-based tests for sequence packing: Spark pack_greedy matches a
pure-Python reference for ANY token-length sequence, and greedy packing
never uses fewer bins than chunked packing (chunking wastes no space)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cnics_to_fhir_spark.operators.dataset import pack_chunked, pack_greedy

BUDGET = 37


def _ref_greedy(toks: list[int]) -> dict[int, tuple[int, int]]:
    out, bin_id, fill, first = {}, -1, 0, True
    for i, t in enumerate(toks):
        if first or fill + t > BUDGET:
            bin_id, fill, first = bin_id + 1, t, False
        else:
            fill += t
        out[i] = (bin_id, fill)
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=60))
def test_greedy_matches_reference_and_chunked_conservation(spark, toks):
    # docs may EXCEED the budget here — greedy must still match the
    # reference (oversized doc = its own overfilled bin)
    rows = [(i, " ".join(["w"] * t), "en") for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {
        r["doc_id"]: (r["bin_id"], r["bin_fill"])
        for r in pack_greedy(df, budget=BUDGET).collect()
    }
    assert got == _ref_greedy(toks)

    # chunked conservation: offsets + token counts reproduce the cumsum
    chunked = pack_chunked(df, budget=BUDGET).collect()
    total = sum(toks)
    last = max(chunked, key=lambda r: r["doc_id"])
    assert last["bin_id"] * BUDGET + last["bin_offset"] + last["tok"] == total


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=BUDGET), min_size=1, max_size=60))
def test_greedy_bin_count_bound_when_docs_fit(spark, toks):
    # the greedy >= chunked bin-count bound only holds when every doc fits
    # the budget: an oversized doc fills ONE overfilled greedy bin but
    # ceil(t/BUDGET) chunked bins (hypothesis found the counterexample —
    # tokens up to 50 against budget 37)
    rows = [(i, " ".join(["w"] * t), "en") for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    greedy_bins = len(
        {r["bin_id"] for r in pack_greedy(df, budget=BUDGET).collect()}
    )
    chunked_bins = len(
        {r["bin_id"] for r in pack_chunked(df, budget=BUDGET).collect()}
    )
    assert greedy_bins >= chunked_bins


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(0, 300),
    st.integers(0, 300),
)
def test_epoch_upsample_counts_match_reference(spark, rows, wa, wb):
    """For ANY weights, every doc appears exactly n = w//100 + (h < w%100)
    times with epochs 1..n — replicated by a pure-Python portable-hash
    reference."""
    import hashlib

    from cnics_to_fhir_spark.operators.dataset import epoch_upsample

    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = epoch_upsample(df, {"a": wa, "b": wb}).collect()
    got: dict[int, list[int]] = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for doc_id, src in rows:
        w = {"a": wa, "b": wb}.get(src, 100)
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100
        n = w // 100 + (1 if h < w % 100 else 0)
        assert sorted(got.get(doc_id, [])) == list(range(1, n + 1)), (doc_id, w, h)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),   # user
            st.integers(min_value=1, max_value=12),  # day-of-month
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ewma_matches_python_reference(spark, pairs):
    """ewma_daily_counts == a pure-Python truncated α=1/2 EWMA over each
    user's OBSERVED days (row-based lags, renormalized over existing
    taps) for arbitrary sparse day patterns."""
    import datetime
    import math

    from cnics_to_fhir_spark.operators.events_windows import ewma_daily_counts

    rows = [
        (u, datetime.datetime(2024, 3, d, 8, 0, 0) + datetime.timedelta(minutes=i))
        for i, (u, d) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    # python reference
    counts: dict[tuple[int, int], int] = {}
    for u, d in pairs:
        counts[(u, d)] = counts.get((u, d), 0) + 1
    expected = {}
    for u in {u for u, _ in pairs}:
        days = sorted(d for (uu, d) in counts if uu == u)
        for idx, d in enumerate(days):
            num = den = 0
            for j in range(8):
                if idx - j < 0:
                    break
                wgt = 1 << (7 - j)
                num += counts[(u, days[idx - j])] * wgt
                den += wgt
            expected[(u, f"2024-03-{d:02d}")] = math.floor(num / den * 1e6 + 0.5) / 1e6

    got = {
        (r["user_id"], r["day"]): r["ewma"]
        for r in ewma_daily_counts(df).collect()
    }
    assert got == expected
