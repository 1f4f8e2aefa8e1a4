"""Reconciliation engine — snapshot diff → action plan (J5-J7, A5, A6).

The reference reconciles per patient, per resource type, with Python loops
over FHIR GET responses (cnics_to_fhir.py:548-570 conditions, :645-666 meds,
:728-750 labs, :328-337 patient anti-join delete). Net semantics per business
key (only ``identifier[0].value`` is compared — :556, :652, :736):

  key in current  ∧ key in existing → update  (PUT  /{type}/{server_id})
  key in current  ∧ key ∉ existing  → insert  (POST /{type})
  key ∉ current   ∧ key in existing → delete  (DELETE /{type}/{server_id})

That is exactly ONE full-outer join per resource type — the engine's central
IR. Everything upstream (extract + transform + assembly) and downstream (the
HTTP writer) hangs off this plan DataFrame, which makes the whole pipeline
testable without a FHIR server and lets the same code run under
``foreachBatch`` for incremental mode (SURVEY.md §2.10).

Scale design: both sides are pre-aggregated to one row per key BEFORE the
join (the reference's loop takes the first key match then breaks — :552-560;
we take a deterministic min per key), so the full-outer shuffle is on a
deduplicated high-cardinality key — no skew amplification, map-side partial
aggregation, and AQE picks the join strategy. When one side is a bounded
per-site snapshot, Catalyst broadcasts it under the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_INSERT = "insert"
ACTION_UPDATE = "update"
ACTION_DELETE = "delete"


def merge_plan(
    current: DataFrame,
    existing: DataFrame,
    key: str = "key",
    existing_id: str = "id",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every business key into insert/update/delete.

    ``current``  — freshly-extracted target state; ≥1 row per ``key``;
                   payload columns are carried through to the writer.
    ``existing`` — store snapshot with columns ``key`` and ``existing_id``.

    Returns: key, action, id (NULL for insert), payload cols (NULL for
    delete). Duplicate keys on either side collapse to one action row,
    matching the reference's first-match-then-break loop.
    """
    payload_cols = payload_cols or [c for c in current.columns if c != key]

    cur = (
        current.groupBy(key)
        .agg(*[F.first(c, ignorenulls=False).alias(c) for c in payload_cols])
        .withColumn("__in_current", F.lit(True))
    )
    exi = (
        existing.groupBy(key)
        .agg(F.min(existing_id).alias("__existing_id"))
        .withColumn("__in_existing", F.lit(True))
    )

    joined = cur.join(exi, on=key, how="full_outer")
    action = (
        F.when(
            F.coalesce(joined["__in_current"], F.lit(False))
            & F.coalesce(joined["__in_existing"], F.lit(False)),
            F.lit(ACTION_UPDATE),
        )
        .when(F.coalesce(joined["__in_current"], F.lit(False)), F.lit(ACTION_INSERT))
        .otherwise(F.lit(ACTION_DELETE))
    )
    return joined.select(
        F.col(key),
        action.alias("action"),
        F.col("__existing_id").alias("id"),
        *[F.col(c) for c in payload_cols],
    )


def anti_join_deletes(existing: DataFrame, current: DataFrame, key: str = "key") -> DataFrame:
    """J5 — site-level patient delete: existing keys absent from the current
    extract (cnics_to_fhir.py:328-337). left_anti keeps the plan broadcast-
    able when ``current`` is the small side."""
    return existing.join(current.select(key).distinct(), on=key, how="left_anti")


def action_counts(plan: DataFrame, resource_type_col: str | None = None) -> DataFrame:
    """A5 — the reference's 12 insert/update/delete counters
    (cnics_to_fhir.py:309-320, :914-925) as one aggregation over the plan."""
    keys = ([resource_type_col] if resource_type_col else []) + ["action"]
    return plan.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def assert_unique_keys(df: DataFrame, key: str) -> DataFrame:
    """A6 — duplicate-identifier guard (cnics_to_fhir.py:359, :906-908):
    returns offending keys; callers raise if non-empty."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
