"""Skew-safe salted equi-join.

A shuffled equi-join sends every row of a key to ONE reducer; a hot key
(Zipfian ids, enum-like columns) turns that reducer into the stage's
straggler at scale. AQE's skew-join split (on by default in session.py)
fixes this at runtime for sort-merge joins, but not for every shape —
stream-static joins and pre-partitioned bucket joins pin their
partitioning, and a salt is then the only lever.

Salting is a pure physical rewrite (the result is row-identical to the
plain join — tests/test_skew.py and the j09 oracle assert it):

- the BIG side gets a deterministic per-row salt in [0, B);
- the SMALL side is replicated B times, once per salt value;
- the join key becomes (key, salt), spreading each hot key over B
  reducers at the cost of a B× blow-up of the small side only.

Choose B ≈ (hot-key row count / target rows per task); the small side must
stay small enough that B copies are still cheap (it usually is — that's
why it's the small side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt_from: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column list ``on``, salted ``buckets``
    ways. ``salt_from`` names big-side columns whose hash spreads the hot
    keys — any stable high-cardinality combination (a row id, or the full
    key of the big table). Join column names must match across sides
    (USING-style); other names must not collide."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    salted_big = big.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets))
    )
    replicated = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    # Pin a shuffled hash join building the replicated side. Without the hint
    # Spark may size-estimate the post-explode small side as unknown and pick
    # the BIG side as broadcast build — shipping the fact table to every
    # executor, the exact failure mode salting exists to avoid. The hint keeps
    # the plan shape honest at any scale: both sides hash-shuffle on
    # (key, salt), so each hot key spreads over ``buckets`` reducers.
    return salted_big.join(replicated.hint("shuffle_hash"), on=[*on, SALT], how=how).drop(SALT)
