"""Cogrouped-map operators: two-sided per-key Arrow processing.

``groupBy().cogroup().applyInPandas`` is the Spark surface for logic that
needs BOTH sides of a key grouped together in one Python batch — the
two-sided sibling of ``applyInPandas``. The engine uses it where per-key
alignment logic is genuinely procedural; everything else stays in native
joins (see operators/merge.py for the set-semantics diff).

Scale shape: a cogroup is one co-partitioned shuffle of each side on the
key — identical cost to the equivalent join — and each (key, batch) pair
is processed independently, so parallelism is the key cardinality, not
the executor count. The Python stage is Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_MATCH = "match"
STATUS_DIFFER = "differ"
STATUS_ONLY_A = "only_a"
STATUS_ONLY_B = "only_b"


def positional_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Row-level drift report between two snapshots: within each key, the
    i-th row of ``a`` (ordered by ``order_col``) is compared to the i-th
    row of ``b`` — match / differ on ``value_col``, only_a / only_b past
    the shorter side. The per-key positional pairing is the part that wants
    both sides in hand at once, which is exactly what cogroup provides;
    the SQL oracle replays it as row_number + full-outer join.

    Output: (key, pos, value_a, value_b, status), pos 1-based.

    Each side is projected to exactly (key, order, value) under fresh
    aliases before the cogroup. That keeps the shuffle narrow (three
    columns, not the whole row) and sidesteps a self-cogroup hazard: when
    both sides descend from the SAME scan, the shared attribute IDs let
    the optimizer mis-prune one side's data columns whenever the query
    output is itself pruned (e.g. under ``.count()``), and the Python
    function then receives frames missing its inputs.
    """
    proj = [
        F.col(key_col).alias("__k"),
        F.col(order_col).alias("__ord"),
        F.col(value_col).alias("__val"),
    ]
    a = a.select(*proj)
    b = b.select(*proj)

    def diff(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # a key present on one side only can arrive as a ZERO-COLUMN empty
        # frame (no Arrow batch was ever built for that side) — normalize
        # before touching columns.
        if left.columns.empty:
            left = pd.DataFrame({c: [] for c in ("__k", "__ord", "__val")})
        if right.columns.empty:
            right = pd.DataFrame({c: [] for c in ("__k", "__ord", "__val")})
        left = left.sort_values("__ord").reset_index(drop=True)
        right = right.sort_values("__ord").reset_index(drop=True)
        n = max(len(left), len(right))
        key = left["__k"].iloc[0] if len(left) else right["__k"].iloc[0]
        rows = []
        for i in range(n):
            va = left["__val"].iloc[i] if i < len(left) else None
            vb = right["__val"].iloc[i] if i < len(right) else None
            if i >= len(right):
                status = STATUS_ONLY_A
            elif i >= len(left):
                status = STATUS_ONLY_B
            elif va == vb:
                status = STATUS_MATCH
            else:
                status = STATUS_DIFFER
            rows.append((key, i + 1, va, vb, status))
        return pd.DataFrame(
            rows, columns=["key", "pos", "value_a", "value_b", "status"]
        )

    return (
        a.groupBy("__k")
        .cogroup(b.groupBy("__k"))
        .applyInPandas(
            diff,
            schema="key long, pos long, value_a double, value_b double, status string",
        )
    )
