"""Named-query registry: every operator in SURVEY.md §2 gets an entry here.

Each entry pairs a Spark DataFrame builder with the equivalent ANSI SQL for
the DuckDB oracle (None for genuinely non-SQL-expressible operators, which
the driver checks rows-only). ``__spark_entry__.py`` is a thin adapter over
this registry.

Determinism rules (the oracle compares an order-insensitive value hash):
- alias every computed column identically on both sides;
- round floating aggregates (money → 2 dp) on both sides;
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark stays
  long);
- never emit a nondeterministically-chosen row (LIMIT without total order,
  first() over duplicate keys, ...).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    tags: str  # SURVEY.md §2 operator ids this query exercises
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def query(name: str, tags: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = CatalogEntry(name=name, tags=tags, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cnics_to_fhir_spark.sources.tables import read_table

    return read_table(spark, sf_dir, name)


# Curated catalog order. The driver verifies a bounded prefix of the catalog
# (50 entries in rounds 1-2), so the §2-core operators and flagship
# extensions come first; rows-only entries (no DuckDB oracle — xxhash64/
# sketch based, pinned by pytest instead) go last. Entries not named here
# keep their registration order after the prioritized block.
#
# The ordering is presentation, not the verification boundary: every entry
# — prefix or not — is oracle-checked each round by `python selfcheck.py`
# (the FULL catalog, whatever its current size, at sf0.001 AND sf0.01 —
# plus the sf1 probe), so entries outside the
# driver's prefix are locally verified, never silently unchecked.
_PRIORITY: tuple[str, ...] = (
    # --- round-7 rotation (final): the driver's 50-entry prefix is the
    # only independent correctness gate. After round 6 the union of
    # CORRECTNESS_r01-r06 keys covered 143/181 catalog entries; the 38
    # remaining never-driver-verified entries (verdict r6 item #1,
    # cross-checked against the committed CORRECTNESS files) all rotate
    # into this prefix now, alongside a 12-entry §2-core spine (trimmed
    # from 14: the reference-parity verticals + one representative per
    # §2 family). 12 + 38 = 50, so this rotation empties the tracker —
    # every catalog entry will have been driver-verified at least once.
    # Rotated-out entries were all driver-green in earlier rounds and
    # remain selfcheck-verified at sf0.001/sf0.01 every round.
    #
    # §2-core spine (driver-green in prior rounds, kept for reference
    # parity: B1-B4 verticals, coding dispatch, lab typing, merge,
    # crosswalk LWW, join+agg, assembly, window, stream).
    "e2e01_conditions_pipeline",
    "e2e02_observations_pipeline",
    "e2e03_medications_pipeline",
    "e2e04_patients_pipeline",
    "f01_dx_coding_dispatch",
    "f11_lab_value_typing",
    "j01_inner_join_agg",
    "j06_merge_actions",
    "a04b_crosswalk_field_lww",
    "b01_resource_assembly",
    "w01_topn_per_group",
    "st01_stream_batch_equivalence",
    # [new-to-driver] the 38 never-driver-verified entries
    # (= _NEVER_DRIVER_VERIFIED below, verbatim; oracle-bearing first,
    # rows-only tail last — the driver records a weaker rows-only check
    # for ann02/a10/a11/a14).
    "dq02_ks_drift",
    "ev10_funnel_latency",
    "mm07_phash_neardup",
    "dc03_domain_cap",
    "ann08_filtered_topk",
    "dq03_version_diff",
    "ann09_ivfpq_topk",
    "ev11_ewma_smoothing",
    "w07_mad_outliers",
    "dd04b_simhash_portable",
    "dd05b_neardup_refined_cells",
    "dd10_dup_clusters_star",
    "dd11_incremental_dedup",
    "ann02b_lsh_topk_portable",
    "ann05_quantized_rerank",
    "ann06_ivf_multiprobe_topk",
    "mn01_hard_negative_mining",
    "tx01_text_profile",
    "tx02_bpe_token_stats",
    "tx03_rolling_fingerprint",
    "tx05_tfidf_topk",
    "tx08_bpe_merge_training",
    "mm01_binary_metadata",
    "mm03_frame_sample",
    "mm05_audio_features",
    "ds01_stratified_sample",
    "ds02_chunked_packing",
    "ds04_deterministic_shuffle",
    "ds05_weighted_sample",
    "ds06_sliding_chunks",
    "ev03_sliding_window",
    "ev04_gap_filled_rollup",
    "ev08_transition_matrix",
    "st03_stream_dedup_equivalence",
    "ann02_lsh_topk",
    "a10_approx_distinct",
    "a11_approx_percentiles",
    "a14_hll_rollup",
)

# Catalog entries that have never appeared in any CORRECTNESS_r0*.json
# (the driver's independent gate). Recompute after each round:
#   catalog keys - union(CORRECTNESS_r01..r0N keys).
# As of round 7 this holds the 38 backlog entries (29 carried from
# rounds 1-5 + 9 added in round 6) — ALL inside the round-7 _PRIORITY
# prefix above — plus the 10 entries round 7 itself added.  Once
# CORRECTNESS_r07.json lands green, recompute: the 38 clear and only the
# round-7 ten remain for the round-8 rotation.
_NEVER_DRIVER_VERIFIED: tuple[str, ...] = (
    # round-7 additions (new this round; they sit OUTSIDE the fixed
    # 50-entry round-7 prefix above and rotate into round 8's prefix —
    # the normal one-round cadence for new entries)
    "a20_weighted_percentiles",
    "dq04_embedding_drift",
    "ann10_recall_eval",
    "dc04_k_anonymity",
    "tx11_zipf_fit",
    "o06_stats_file_skipping",
    "ann11_mmr_diversified",
    "u03_schema_evolution_scan",
    "j15_merge_table_sink",
    "st08_stream_cdc_table_merge",
    # round-6 additions (new that round, by definition never driven)
    "dq02_ks_drift",
    "ev10_funnel_latency",
    "mm07_phash_neardup",
    "dc03_domain_cap",
    "ann08_filtered_topk",
    "dq03_version_diff",
    "ann09_ivfpq_topk",
    "ev11_ewma_smoothing",
    "w07_mad_outliers",
    # carried from rounds 1-5
    "dd04b_simhash_portable",
    "dd05b_neardup_refined_cells",
    "dd10_dup_clusters_star",
    "dd11_incremental_dedup",
    "ann02b_lsh_topk_portable",
    "ann05_quantized_rerank",
    "ann06_ivf_multiprobe_topk",
    "mn01_hard_negative_mining",
    "tx01_text_profile",
    "tx02_bpe_token_stats",
    "tx03_rolling_fingerprint",
    "tx05_tfidf_topk",
    "tx08_bpe_merge_training",
    "mm01_binary_metadata",
    "mm03_frame_sample",
    "mm05_audio_features",
    "ds01_stratified_sample",
    "ds02_chunked_packing",
    "ds04_deterministic_shuffle",
    "ds05_weighted_sample",
    "ds06_sliding_chunks",
    "ev03_sliding_window",
    "ev04_gap_filled_rollup",
    "ev08_transition_matrix",
    "st03_stream_dedup_equivalence",
    "ann02_lsh_topk",
    "a10_approx_distinct",
    "a11_approx_percentiles",
    "a14_hll_rollup",
)


def catalog() -> dict[str, CatalogEntry]:
    # Import side-effect modules that populate the registry.
    from cnics_to_fhir_spark.plans import e2e, relational, scale_ops, streaming_eq, transforms  # noqa: F401

    ordered: dict[str, CatalogEntry] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    # remaining oracle-bearing entries keep registration order ...
    for name, entry in _REGISTRY.items():
        if name not in ordered and entry.oracle is not None:
            ordered[name] = entry
    # ... and rows-only entries (pytest-pinned) close the catalog.
    for name, entry in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered
