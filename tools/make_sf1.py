"""Synthesize an sfN dataset (COPIES × sf0.1) under /tmp for scale probing.

The driver ships sf0.001/0.01/0.1 only; wall-time there is overhead-bound
(PLANS.md "Measured scaling"), so data-proportional effects barely show.
This tool replicates sf0.1 with disjoint key ranges — foreign keys offset
consistently on both sides, so joins keep their selectivity and group
counts scale ~COPIES× — giving further points at a genuine 1000×-10000×
span over sf0.001: 10 copies ⇒ sf1, 100 copies ⇒ sf10.

Usage: python tools/make_sf1.py [out_dir] [copies]
       (defaults: /tmp/sf1 10;  sf10: python tools/make_sf1.py /tmp/sf10 100)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cnics_to_fhir_spark.session import build_session
from cnics_to_fhir_spark.sources.tables import read_table

SRC = "/root/testdata/sf0.1"
COPIES = 10

# Offsets chosen far above every sf0.1 key range so copies never collide.
OFF = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "event": 100_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}


def replicate(df, shifts: dict[str, int], variant=None):
    """Union COPIES key-shifted copies; ``variant(df, i)`` decorrelates
    content across copies where exact duplication would inflate cross-copy
    similarity quadratically (near-dup pairs, identical embeddings) and
    misrepresent scaling."""
    copies = []
    for i in range(COPIES):
        c = df
        for col, base in shifts.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * base).cast("long"))
        if variant is not None:
            c = variant(c, i)
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _doc_variant(df, i: int):
    # prefix every token with a copy marker: within-copy dup structure is
    # preserved exactly, cross-copy shingle Jaccard drops to zero
    if i == 0:
        return df
    return df.withColumn(
        "text", F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}$1")
    )


def _emb_variant(df, i: int):
    # rotate the vector by a copy-dependent number of positions (norms and
    # value distribution unchanged, cross-copy cosine decorrelated); 7 is
    # coprime with 64 so rotations stay distinct for 64 copies, and copies
    # past the rotation cycle additionally negate the vector so no two
    # copies of the same base vector are near-duplicates at 100 copies
    if i == 0:
        return df
    dim = 64
    r = (i * 7) % dim
    v = F.col("embedding")
    rotated = F.concat(F.slice(v, r + 1, dim - r), F.slice(v, 1, r)) if r else v
    if i >= dim:
        rotated = F.transform(rotated, lambda x: -x)
    return df.withColumn("embedding", rotated)


def main() -> None:
    global COPIES
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    spark = build_session("make_sf1")
    t = lambda name: read_table(spark, SRC, name)

    jobs = {
        "region": (t("region"), {}),
        "nation": (t("nation"), {}),
        "customer": (t("customer"), {"c_custkey": OFF["custkey"]}),
        "supplier": (t("supplier"), {"s_suppkey": OFF["suppkey"]}),
        "part": (t("part"), {"p_partkey": OFF["partkey"]}),
        "orders": (
            t("orders"),
            {"o_orderkey": OFF["orderkey"], "o_custkey": OFF["custkey"]},
        ),
        "lineitem": (
            t("lineitem"),
            {
                "l_orderkey": OFF["orderkey"],
                "l_partkey": OFF["partkey"],
                "l_suppkey": OFF["suppkey"],
            },
        ),
        "events": (
            t("events"),
            {"event_id": OFF["event"], "user_id": OFF["user"]},
        ),
        "documents": (t("documents"), {"doc_id": OFF["doc"]}, _doc_variant),
        "embeddings": (t("embeddings"), {"vec_id": OFF["vec"]}, _emb_variant),
    }
    for name, spec in jobs.items():
        df, shifts = spec[0], spec[1]
        variant = spec[2] if len(spec) > 2 else None
        dest = os.path.join(out_dir, f"{name}.parquet")
        out = replicate(df, shifts, variant) if shifts else df
        # integer key columns keep their physical type after the shift
        for col, _ in shifts.items():
            dtype = dict(df.dtypes)[col]
            if dtype != "bigint":
                out = out.withColumn(col, F.col(col).cast(dtype))
        out.coalesce(8).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows -> {dest}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
