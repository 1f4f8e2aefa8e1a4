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
    # --- round-5 rotation policy: the driver's 50-entry prefix is the only
    # independent correctness gate, so every round rotates in entries that
    # have NEVER been driver-verified (20 this round, marked [new-to-
    # driver]) while keeping a stable §2-core spine; the list below is
    # exactly 50 so every prefix slot is curated, none filled by
    # registration-order accident.  Rotated-out entries
    # (e2e05, f05, f12, f14, p06, p08, j03, a04, w02, aj01, ev01, ann03,
    # dc02, tx06, ds07, dd08, ds08, st02, dd09, j13, tx07, mm06) were all
    # driver-green in rounds 1-4 and remain selfcheck-verified at three SFs
    # every round; each is also exercised through a prefix-resident sibling
    # (ev01's windowing inside st06; aj01's operator composed both
    # directions inside aj02; ann03's IVF probe inside ann04-trained cl01
    # and dd05's cell blocking; the curation family inside e2e07).
    # end-to-end verticals (§3.3 lifecycle, B1-B4, J6, A5)
    "e2e01_conditions_pipeline",
    "e2e02_observations_pipeline",
    "e2e03_medications_pipeline",
    "e2e04_patients_pipeline",
    # §2.8 scalar-function layer, queried directly (F1-F22)
    "f01_dx_coding_dispatch",
    "f04_med_status",
    "f11_lab_value_typing",
    # §2.2-2.7 relational core
    "j01_inner_join_agg",
    "j06_merge_actions",
    "j08_broadcast_membership",
    "a03_first_row_per_group",
    "a04b_crosswalk_field_lww",
    "a06_uniqueness_guard",
    "o03_deterministic_sample",
    "w01_topn_per_group",
    "b01_resource_assembly",
    # flagship scale extensions (driver-green in prior rounds)
    "rj01_interval_attribution",
    "ev02_sessionization",
    "ann01_cosine_topk",
    "dd01_exact_dedup",
    "dd02_ngram_jaccard",
    "dd05_embedding_neardup",
    "dd03b_minhash_lsh_portable",
    "mm04_real_png_decode",
    "e2e06_entity_resolution",
    "st01_stream_batch_equivalence",
    "dc01_decontaminate",
    "e2e07_curation_v2",
    # [new-to-driver] q-suite classics that predate the 50-entry window
    "q02_min_cost_supplier",
    "q07_volume_shipping",
    "q15_top_supplier",
    # [new-to-driver] window/aggregate family
    "w04_rank_family",
    "a16_cube_subtotals",
    "tx04_heavy_hitters",
    # [new-to-driver] dataset assembly + mixtures
    "ds03_greedy_packing",
    "ds09_temperature_mixture",
    # [new-to-driver] fuzzy matching + event analytics
    "dd07_fuzzy_name_match",
    "ev06_cohort_retention",
    "ev07_funnel",
    # [new-to-driver] as-of nearest, bucketed co-located join
    "aj02_asof_nearest",
    "j12_bucketed_colocated_join",
    # [new-to-driver] trained-quantizer clustering + IVF probe
    "cl01_kmeans_assign",
    "ann04_ivf_trained_topk",
    # [new-to-driver] graph propagation: fixed-iter + converged fixpoint
    "gr01_pagerank_2iter",
    "gr02_pagerank_converged",
    # [new-to-driver] streaming: stateful sessions, stream-stream join,
    # checkpoint-restart recovery (st06 is new this round)
    "st04_stream_session_equivalence",
    "st05_stream_stream_join_equivalence",
    "st06_stream_restart_equivalence",
    # [new-to-driver] round-5 second batch, completing the 50: sub-document
    # exact-span dedup and the scale-safe exact-NTILE quality bands
    # (displacing q01/q03, driver-green in rounds 1-2 and still
    # selfcheck-verified at three SFs; rj02/tx09 queue for round 6)
    "dd12_duplicated_spans",
    "ds10_quality_buckets",
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
