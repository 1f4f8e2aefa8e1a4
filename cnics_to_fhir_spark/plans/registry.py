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
    # --- round-9 rotation: CORRECTNESS_r08 went green on its full
    # 50-entry prefix (all 9 pending round-7 entries + all 16 round-8
    # newcomers + 13 fillers). This prefix now holds:
    #   1. the 12-entry §2-core spine (reference-parity verticals +
    #      one representative per §2 family — kept every round),
    #   2. the 7 rows-only entries (oracle=None, pytest error-pinned):
    #      their ONLY driver records are r01 (dd03/dd04), r07's `no_oracle`
    #      rows (a14) or r07's canonicalizer CRASH (a11 — since fixed to
    #      scalar p50/p90/p99) — and a10/ann02/ann11 have NONE. This round
    #      closes the ledger: every catalog entry ever shipped gets a
    #      clean, non-crashing driver record,
    #   3. round-9 NEW entries (driver-verified same round they ship),
    #   4. re-verification fillers: oracle entries whose last driver check
    #      is oldest (rounds 1-3), displaced from the end as newcomers land.
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
    # (2) the rows-only family — first (or first CLEAN) driver records
    "a11_approx_percentiles",
    "a10_approx_distinct",
    "a14_hll_rollup",
    "ann02_lsh_topk",
    "ann11_mmr_diversified",
    "dd03_minhash_lsh",
    "dd04_simhash_near_dup",
    # (3) round-9 newcomers (driver-verified same round they ship)
    "e2e11_incremental_corpus_update",
    "ds14_temperature_mixture_join",
    "lb04_annotator_reliability",
    "u05_partition_evolution_scan",
    "dc06_l_diversity",
    "e2e12_reliability_weighted_labels",
    "ev13_cohort_retention",
    "tx13_bigram_surprise",
    "lb05_dawid_skene_relabel",
    "st10_stream_label_campaign",
    "o07_time_travel_merge",
    "o08_change_data_feed",
    "u06_type_widening_scan",
    "ds15_export_manifest",
    "e2e13_pretraining_export",
    # (4) re-verification fillers, oldest driver check first (r1/r2,
    # then the round-3 block)
    "q19_disjunctive_revenue",
    "q21_sole_return_supplier",
    "q22_dormant_balances",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "a01_distinct",
    "a02_collect_set",
    "a05_group_counts",
    "dd06_dup_clusters",
    "f08_demographic_maps",
    "f17_date_format",
    "f20_json_roundtrip",
    "j02_join_distinct",
    "j05_anti_join",
    "j06b_merge_dup_keys",
    "j07_semi_join",
    "o02_order_limit",
    "p04_nullsafe_inequality",
    "u01_union_by_name",
    # r4 block (overflow past 50 is harmless — the driver truncates)
    "a04_last_write_wins",
    "aj01_asof_join",
    "ann03_ivf_topk",
    "dc02_pii_redaction",
    "dd08_boilerplate_removal",
    "dd09_semantic_dedup",
    "ds07_hash_split",
    "ds08_epoch_mixture",
)

# Catalog entries that have never appeared in any CORRECTNESS_r0*.json
# (the driver's independent gate). Recompute after each round:
#   catalog keys - union(CORRECTNESS_r01..r0N keys).
# CORRECTNESS_r07 landed green on its full 50-entry prefix, clearing the
# round-6 backlog; only the 10 round-7 additions remain, all rotated into
# the round-8 prefix above.
_NEVER_DRIVER_VERIFIED: tuple[str, ...] = (
    # Recomputed after round 8 (catalog keys − union of CORRECTNESS_r01-r08
    # keys): the r08 prefix went 50/50 green, so only ONE entry has never
    # appeared in any CORRECTNESS file — ann11 (rows-only, registered after
    # the r07 prefix froze and cut from r08's 50 at position 51). It heads
    # block (2) of the round-9 prefix above; round-9 newcomers ship in the
    # same commit as their block-(3) slot, so this tuple should be EMPTY
    # after round 9.
    "ann11_mmr_diversified",
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
