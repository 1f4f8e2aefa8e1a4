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
from cnics_to_fhir_spark.operators.similarity import dot_sql, sql_double


def nearest_centroid(v_sql: str, centroid_rows: list[tuple[int, list[float]]]):
    """(cid, dist) of the nearest centroid as a pure projection expression;
    ``v_sql`` is the vector as a SQL expression string.

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
    narrow map over the corpus instead of a corpus shuffle.

    Built as ONE SQL string handed to a single ``F.expr`` parse: the
    Column-by-Column construction was ~2.4 s of py4j round-trips per
    entry (one RPC per lit/struct/higher-order call, k×dim literals per
    assignment — ann09 spent more driver wall building expressions than
    executing jobs; guide §5).  The parsed tree is the same expression —
    double literals use repr() (shortest round-trip form) with the ``D``
    suffix, so every literal is the identical IEEE-754 double."""
    structs = []
    for cid, cv in centroid_rows:
        arr = "array(" + ", ".join(sql_double(x) for x in cv) + ")"
        cc = 0.0
        for x in cv:
            cc += float(x) * float(x)
        d = (
            f"(({dot_sql(v_sql, v_sql)}) - (2 * ({dot_sql(v_sql, arr)}))"
            f" + {sql_double(cc)})"
        )
        structs.append(f"named_struct('dist', {d}, 'cid', {int(cid)})")
    best = F.expr(f"array_min(array({', '.join(structs)}))")
    return best["cid"], best["dist"]


# Above this many inlined double literals (k × dim) the projection-argmin
# expression tree bloats the plan and every task binary, and analysis cost
# grows with it (VERDICT r12 #3); fall back to shipping the matrix as
# broadcast DATA (crossJoin + grouped argmin) instead of expression
# literals.  65k literals ≈ k=512 at dim=128 — far above every current
# caller (k ≤ 16, codebooks 256 × subdim); the fallback trades one
# (vec_id)-keyed exchange for a plan that stays O(1) in k×dim.
ASSIGN_INLINE_MAX_LITERALS = 1 << 16


def _assign_broadcast(
    vectors: DataFrame, centroid_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """Broadcast-join argmin — value-identical to the inlined projection:
    the per-centroid distance is the same ``⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩``
    expression tree (``dot`` parses/builds the identical zip_with +
    left-to-right aggregate; ⟨c,c⟩ folded on the driver with the same
    sequential double adds), and ``min(struct(dist, cid))`` is the same
    (dist, cid)-lexicographic tie-break ``array_min`` applies."""
    from cnics_to_fhir_spark.operators.similarity import dot

    spark = vectors.sparkSession
    rows = []
    for cid, cv in centroid_rows:
        cc = 0.0
        for x in cv:
            cc += float(x) * float(x)
        rows.append((int(cid), [float(x) for x in cv], cc))
    cent = spark.createDataFrame(rows, "cid int, cv array<double>, cc double")
    d = dot(F.col("v"), F.col("v")) - 2 * dot(F.col("v"), F.col("cv")) + F.col("cc")
    return (
        vectors.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "v", F.struct(d.alias("dist"), F.col("cid")).alias("__dc")
        )
        .groupBy("vec_id")
        .agg(F.min("__dc").alias("__dc"), F.first("v").alias("v"))
        .select(
            "vec_id", "v", F.col("__dc.cid").alias("cid"), F.col("__dc.dist").alias("dist")
        )
    )


def _assign(vectors: DataFrame, centroid_rows: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest centroid per vector as a shuffle-free projection."""
    if not centroid_rows:
        # empty centroid set (empty input): preserve the old crossJoin
        # semantics — an empty result with the assignment schema
        return vectors.select(
            "vec_id", "v", F.lit(0).alias("cid"), F.lit(0.0).alias("dist")
        ).limit(0)
    if sum(len(cv) for _, cv in centroid_rows) > ASSIGN_INLINE_MAX_LITERALS:
        return _assign_broadcast(vectors, centroid_rows)
    cid, dist = nearest_centroid("v", centroid_rows)
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
