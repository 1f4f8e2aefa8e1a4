"""Mergeable distinct-count sketches: the pre-aggregated rollup pattern.

At 100 TB you cannot re-scan the fact table for every distinct-count
granularity. The scalable shape is a two-level rollup: scan ONCE into
per-fine-grain HLL sketches (a bounded ~KB binary per group, built with
map-side partial aggregation), persist those, and answer every coarser
granularity by UNIONING sketches — never touching raw data again.
``approx_count_distinct`` (a10) gives one-shot estimates; this operator
exposes the sketch itself so rollups compose.

Spark surface: `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
(Apache DataSketches HLL under the hood, deterministic for a fixed lgK).
Register-max union is commutative and associative, so the merge tree's
shape — and therefore Spark's partitioning — cannot change the estimate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame,
    fine_keys: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """One scan → one HLL sketch per fine-grain group.

    Output: fine_keys + ``sketch`` (binary) + ``n_rows``. This is the
    persistable artifact: each sketch is ≤ 2^lgk bytes regardless of group
    cardinality, and partial aggregation combines map-side, so the shuffle
    carries sketches, not distinct keys (exact COUNT(DISTINCT) shuffles
    every distinct key; see a10's docstring).
    """
    return df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    coarse_keys: Sequence[str],
) -> DataFrame:
    """Merge fine sketches up to a coarser granularity — no raw-data scan.

    Output: coarse_keys + ``approx_distinct`` + ``n_rows``. Works on the
    output of :func:`hll_sketches` or on any persisted sketch table with a
    ``sketch`` binary column; union of unions is still a valid sketch, so
    rollups chain (hour → day → month) with each level reading only the
    previous level's sketches.
    """
    merged = sketches.groupBy(*coarse_keys).agg(
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *coarse_keys,
        F.hll_sketch_estimate("sketch").cast("long").alias("approx_distinct"),
        "n_rows",
    )
