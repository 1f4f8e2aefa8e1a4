"""K-means (Lloyd) training over an embedding column — the iterative-
refinement algorithm class, expressed the idiomatic Spark way: the corpus
never leaves the cluster; only the k×dim centroid matrix round-trips the
driver between iterations (exactly MLlib's structure).

Per iteration: inline the tiny centroid matrix as literal expressions,
assign each vector to its nearest centroid (argmin as a pure projection —
no join, no window, no shuffle; see ``nearest_centroid``), recompute
centroids as per-dimension means (posexplode → groupBy(cid, dim) — a
shuffle of |corpus|×dim scalar rows, the only shuffle per iteration).

Determinism across engines (for the DuckDB oracle, which unrolls the same
fixed iteration count in SQL): centroids round to 6 dp after init and every
recompute, squared distances use the identical dot-product expansion
``<v,v> - 2<v,c> + <c,c>`` on both sides, and argmin ties break on the
centroid id — so assignments match exactly unless two distances collide
within float-summation noise of a rounding boundary (~1e-15).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnics_to_fhir_spark.functions.numeric import stable_round
from cnics_to_fhir_spark.operators.similarity import dot


def nearest_centroid(v, centroid_rows: list[tuple[int, list[float]]]):
    """(cid, dist) of the nearest centroid as a pure projection expression.

    The centroid matrix is driver-resident by construction (it round-trips
    the driver every Lloyd iteration), so the argmin needs no join and no
    window: each centroid's squared distance is inlined as a literal-array
    expression and the min is taken over an array<struct<dist,cid>> —
    struct comparison orders by dist then cid, exactly the
    ``row_number() OVER (ORDER BY dist, cid)`` tie-break the crossJoin
    formulation used.  Numerics are identical: ``dot(v,v) - 2*dot(v,lit(c))
    + lit(<c,c>)`` evaluates the same left-to-right double chain as
    ``_sq_dist`` over a centroid column (the ⟨c,c⟩ term is folded on the
    driver with the same sequential double adds Spark's ``aggregate``
    performs).  This removes one Exchange (hash by vec_id for the window)
    plus a crossJoin per assignment pass — at 100 TB the assignment is a
    narrow map over the corpus instead of a corpus shuffle."""
    structs = []
    for cid, cv in centroid_rows:
        cv_lit = F.array(*[F.lit(float(x)) for x in cv])
        cc = 0.0
        for x in cv:
            cc += float(x) * float(x)
        d = dot(v, v) - 2 * dot(v, cv_lit) + F.lit(cc)
        structs.append(F.struct(d.alias("dist"), F.lit(int(cid)).alias("cid")))
    best = F.array_min(F.array(*structs))
    return best["cid"], best["dist"]


def _assign(vectors: DataFrame, centroid_rows: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest centroid per vector as a shuffle-free projection."""
    if not centroid_rows:
        # empty centroid set (empty input): preserve the old crossJoin
        # semantics — an empty result with the assignment schema
        return vectors.select(
            "vec_id", "v", F.lit(0).alias("cid"), F.lit(0.0).alias("dist")
        ).limit(0)
    cid, dist = nearest_centroid(F.col("v"), centroid_rows)
    return vectors.select(
        "vec_id", "v", cid.alias("cid"), dist.alias("dist")
    )


def kmeans_assign(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from a deterministic init (the k
    lowest-id vectors) and return the final assignment
    (vec_id, cluster, dist — dist rounded 6 dp)."""
    assigned, _ = kmeans_train(spark, df, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    return assigned


def kmeans_train(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """``kmeans_assign`` plus the trained centroid matrix: → (assignment
    DataFrame, [(cid, centroid_vector), ...]).  The centroid list is what
    multi-probe search needs (ann06) — k×dim floats, driver-resident by
    design (the same matrix that round-trips the driver per iteration).

    The returned centroids are the ones that PRODUCED the final
    assignment (pre-final-recompute): probe selection against any other
    matrix would disagree with the cell the corpus was indexed under —
    and with the oracle, which unrolls exactly ``iters`` assign steps."""
    vectors = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    init = vectors.orderBy("vec_id").limit(k).collect()
    centroid_rows = [
        (cid, [math.floor(x * 1e6 + 0.5) / 1e6 for x in r["v"]])
        for cid, r in enumerate(init)
    ]

    if iters < 1:
        raise ValueError("kmeans_train needs iters >= 1")
    for step in range(iters):
        used_rows = centroid_rows
        assigned = _assign(vectors, centroid_rows)
        if step + 1 == iters:
            break  # the final recompute would never be consumed
        means = (
            assigned.select("cid", F.posexplode("v").alias("idx", "val"))
            .groupBy("cid", "idx")
            .agg(stable_round(F.avg("val"), 6).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("idx", "m"))).alias("dims"))
            .select("cid", F.col("dims.m").alias("cv"))
            .collect()
        )
        centroid_rows = [(r["cid"], list(r["cv"])) for r in means]

    out = assigned.select(
        "vec_id",
        F.col("cid").alias("cluster"),
        stable_round(F.col("dist"), 6).alias("dist"),
    )
    return out, used_rows
