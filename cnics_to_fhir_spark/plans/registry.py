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
    # --- round-8 rotation: CORRECTNESS_r07 went green on all 46 oracle
    # prefix entries (+4 rows-only recorded), clearing the round-6
    # 38-entry backlog. This prefix now holds:
    #   1. the 12-entry §2-core spine (reference-parity verticals +
    #      one representative per §2 family — kept every round),
    #   2. the 10 round-7 entries that landed after the round-7 prefix
    #      froze (9 oracle-bearing + ann11 rows-only) plus a11, whose
    #      array column crashed the driver canonicalizer in r7 and now
    #      emits scalar p50/p90/p99,
    #   3. re-verification fillers: the entries whose last driver check
    #      is oldest (rounds 1-3), so driver coverage stays fresh while
    #      slots remain; round-8 NEW entries displace fillers from the
    #      end of this list as they land.
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
    # (2) round-7 newcomers awaiting their first driver check
    # (oracle-bearing first)
    "a20_weighted_percentiles",
    "ann10_recall_eval",
    "dc04_k_anonymity",
    "dq04_embedding_drift",
    "j15_merge_table_sink",
    "o06_stats_file_skipping",
    "st08_stream_cdc_table_merge",
    "tx11_zipf_fit",
    "u03_schema_evolution_scan",
    # (3) round-8 newcomers (driver-verified same round they ship)
    "s05_fhir_snapshot_replay",
    "o06b_manifest_file_skipping",
    "dd14_semantic_decontaminate",
    "lb01_majority_vote",
    "tx12_tfidf_hashed",
    "a21_quantile_sketch",
    "ev12_asof_tolerance",
    "dc05_pii_pseudonymize",
    "lb02_bradley_terry",
    "dq05_expectation_suite",
    "e2e09_label_export_pipeline",
    "u04_rename_evolution_scan",
    "st09_stream_quality_gate",
    "ds13_leakage_safe_split",
    "lb03_fleiss_kappa",
    "e2e10_pretraining_data_build",
    # (4) re-verification fillers, oldest driver check first
    "q06_forecast_revenue",
    "q04_order_priority",
    "q17_small_quantity_revenue",
    "j09_salted_skew_join",
    "j10_bloom_semi_join",
    "a12_pivot_revenue",
    "a13_column_profile",
    "j11_scd2_merge",
    "o05_zorder_key",
    "cg01_positional_diff",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q21_sole_return_supplier",
    "q22_dormant_balances",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    # rows-only tail (driver records a weaker rows-only check)
    "ann11_mmr_diversified",
    "a11_approx_percentiles",
)

# Catalog entries that have never appeared in any CORRECTNESS_r0*.json
# (the driver's independent gate). Recompute after each round:
#   catalog keys - union(CORRECTNESS_r01..r0N keys).
# CORRECTNESS_r07 landed green on its full 50-entry prefix, clearing the
# round-6 backlog; only the 10 round-7 additions remain, all rotated into
# the round-8 prefix above.
_NEVER_DRIVER_VERIFIED: tuple[str, ...] = (
    # round-7 additions: registered after the round-7 prefix froze, so
    # their first driver check is round 8 — all sit in block (2)/(tail)
    # of _PRIORITY above. Recompute after round 8:
    #   catalog keys - union(CORRECTNESS_r01..r08 keys)
    # should leave only round-8 newcomers added after ITS prefix froze
    # (none if block (3) ships with the same commit as the entries).
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
    # round-8 additions, shipped in the same commit as their prefix slot
    # (block 3 above), so their first driver check is round 8 itself
    "s05_fhir_snapshot_replay",
    "o06b_manifest_file_skipping",
    "dd14_semantic_decontaminate",
    "lb01_majority_vote",
    "tx12_tfidf_hashed",
    "a21_quantile_sketch",
    "ev12_asof_tolerance",
    "dc05_pii_pseudonymize",
    "lb02_bradley_terry",
    "dq05_expectation_suite",
    "e2e09_label_export_pipeline",
    "u04_rename_evolution_scan",
    "st09_stream_quality_gate",
    "ds13_leakage_safe_split",
    "lb03_fleiss_kappa",
    "e2e10_pretraining_data_build",
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
