"""S11 — run metrics without extra passes.

The reference keeps 12 Python counters and logs them at the end
(cnics_to_fhir.py:309-320, :914-926). The engine gets the same numbers two
ways:
- ``action_counts`` (operators/merge.py): an aggregation over the plan —
  exact, costs one small job;
- ``observe_plan`` here: ``DataFrame.observe`` metrics collected DURING the
  write job — zero extra passes, the idiomatic Spark form of inline counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_plan(plan: DataFrame, name: str = "plan_metrics") -> tuple[DataFrame, Observation]:
    """Attach insert/update/delete counters to the plan; read
    ``observation.get`` AFTER an action has executed the DataFrame."""
    obs = Observation(name)
    observed = plan.observe(
        obs,
        F.sum(F.when(F.col("action") == "insert", 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(F.col("action") == "update", 1).otherwise(0)).alias("n_update"),
        F.sum(F.when(F.col("action") == "delete", 1).otherwise(0)).alias("n_delete"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return observed, obs
