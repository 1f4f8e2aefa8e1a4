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
  first() over duplicate keys, ...);
- integer division of a NEGATIVE numerator: Spark's DIV and DuckDB's //
  both truncate toward zero (C-style) — python's // floors, so pure-python
  test mirrors must use int(a/b)-style truncation (lb03's kappa lesson).
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
    # --- round-10 rotation: CORRECTNESS_r09 went green on its full
    # 50-entry prefix (43 hash-green + 7 clean no_oracle), closing the
    # driver ledger at 222/222 entries ever shipped. This prefix holds:
    #   1. the 12-entry §2-core spine (reference-parity verticals +
    #      one representative per §2 family — kept every round),
    #   2. round-10 NEW entries (driver-verified same round they ship),
    #   3. the 4 stalest driver records (j07/o02/p04/u01 — last driver
    #      check r03; the freshness tail round 9's verdict flagged),
    #   4. re-verification fillers: the full r4 block, then the oldest
    #      r5 entries — keeps every driver record ≤ ~6 rounds old.
    # Every entry — prefix or not — is still oracle-checked each round
    # by `python selfcheck.py` (full catalog, sf0.001 + sf0.01).
    #
    # (1) §2-core spine
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
    # (2) round-10 newcomers (driver-verified same round they ship)
    "lb06_dawid_skene_converged",
    "ds16_incremental_reexport",
    "st11_stream_incremental_export",
    "tx14_bm25_topk",
    "o09_versioned_compaction",
    "dd15_lsh_pr_eval",
    # (3) the 4 stalest driver records (r03)
    "j07_semi_join",
    "o02_order_limit",
    "p04_nullsafe_inequality",
    "u01_union_by_name",
    # (4) re-verification fillers: the r4 block, then the oldest r5
    # entries (overflow past 50 is harmless — the driver truncates)
    "a04_last_write_wins",
    "aj01_asof_join",
    "ann03_ivf_topk",
    "dc02_pii_redaction",
    "dd08_boilerplate_removal",
    "dd09_semantic_dedup",
    "ds07_hash_split",
    "ds08_epoch_mixture",
    "e2e05_corpus_curation",
    "ev01_tumbling_window",
    "f05_dx_category_maps",
    "f12_unit_default_refrange",
    "f14_string_cleanup",
    "j03_decorrelated_page",
    "j13_dynamic_partition_pruning",
    "mm06_image_phash_dedup",
    "p06_in_list_and_like",
    "p08_guard_quirk",
    "st02_stream_window_equivalence",
    "tx06_repetition_signals",
    "tx07_unigram_surprise",
    "w02_running_spend",
    # oldest r5 entries
    "a03_first_row_per_group",
    "a16_cube_subtotals",
    "aj02_asof_nearest",
    "ann01_cosine_topk",
    "ann04_ivf_trained_topk",
    "cl01_kmeans_assign",
    "dc01_decontaminate",
    "dd01_exact_dedup",
    "dd02_ngram_jaccard",
    "dd03b_minhash_lsh_portable",
    "dd05_embedding_neardup",
    "dd07_fuzzy_name_match",
    "dd12_duplicated_spans",
    "ds03_greedy_packing",
)

# Catalog entries that have never appeared in any CORRECTNESS_r0*.json
# (the driver's independent gate). Recompute after each round:
#   catalog keys - union(CORRECTNESS_r01..r0N keys).
# CORRECTNESS_r07 landed green on its full 50-entry prefix, clearing the
# round-6 backlog; only the 10 round-7 additions remain, all rotated into
# the round-8 prefix above.
_NEVER_DRIVER_VERIFIED: tuple[str, ...] = (
    # Recomputed after round 9 (catalog keys − union of CORRECTNESS_r01-r09
    # keys): the r09 prefix went 50/50 clean, closing the ledger — every
    # round-9 entry has a driver record. Only the round-10 newcomers
    # remain, both in block (2) of the round-10 prefix above, so this
    # tuple should be EMPTY after round 10.
    "lb06_dawid_skene_converged",
    "ds16_incremental_reexport",
    "st11_stream_incremental_export",
    "tx14_bm25_topk",
    "o09_versioned_compaction",
    "dd15_lsh_pr_eval",
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
