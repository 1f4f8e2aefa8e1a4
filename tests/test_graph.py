"""Integer PageRank semantics on a hand-checkable fixture
(operators/graph.py); corpus-scale equivalence runs in the oracle
(gr01_pagerank_2iter)."""

from __future__ import annotations

from cnics_to_fhir_spark.operators.graph import BASE_Q, SCALE, pagerank_int


def test_pagerank_int_hand_computed(spark):
    # star: 1 -> 2, 3 -> 2, 2 -> 1  (node 2 collects from two sources)
    edges = spark.createDataFrame([(1, 2), (3, 2), (2, 1)], ["src", "dst"])
    out = {r["node"]: r["rank_q"] for r in pagerank_int(edges, iters=1).collect()}
    # deg: 1->1, 3->1, 2->1; start 1e6 each
    # node 2 receives 1e6 + 1e6 -> 150000 + 85*2e6//100
    assert out[2] == BASE_Q + (85 * 2 * SCALE) // 100
    # node 1 receives 1e6 from node 2
    assert out[1] == BASE_Q + (85 * SCALE) // 100
    # node 3 receives nothing
    assert out[3] == BASE_Q
    # two iterations: node 3 still dangling-in, node 2 fed by updated ranks
    out2 = {r["node"]: r["rank_q"] for r in pagerank_int(edges, iters=2).collect()}
    assert out2[3] == BASE_Q
    assert out2[2] == BASE_Q + (85 * (out[1] + out[3])) // 100


def test_pagerank_converged_reaches_integer_fixpoint(spark):
    from cnics_to_fhir_spark.operators.graph import pagerank_int_converged

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1)], ["src", "dst"]
    )
    rows = pagerank_int_converged(edges, tol_q=1000, max_iters=60).collect()
    out = {r["node"]: r["rank_q"] for r in rows}
    iters = {r["iters"] for r in rows}
    # hand-replayed integer trajectory (same loop in plain Python): the
    # 4-edge cycle graph converges to these exact micro-unit ranks after
    # 12 full steps with tol 1000 — also the gr02 oracle's fixture case
    assert out == {1: 1192622, 2: 1163729, 3: 643640}
    assert iters == {12}
    # convergence is a true fixpoint: iterating from the answer moves no
    # node by more than the tolerance
    again = pagerank_int_converged(edges, tol_q=1000, max_iters=60).collect()
    assert {r["node"]: r["rank_q"] for r in again} == out


def test_star_contraction_matches_label_propagation(spark):
    """Two independent CC implementations must agree on every component —
    including a long CHAIN, label propagation's worst case (O(diameter)
    rounds) and exactly the shape star contraction exists to kill."""
    from cnics_to_fhir_spark.operators.dedup import duplicate_clusters
    from cnics_to_fhir_spark.operators.graph import connected_components_star

    # chain 1-2-...-12 (diameter 11), a triangle {20,21,22}, a pair {30,31}
    chain = [(i, i + 1) for i in range(1, 12)]
    pairs = chain + [(20, 21), (21, 22), (20, 22), (30, 31)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    star = {r["doc_id"]: r["cluster_rep"] for r in connected_components_star(df).collect()}
    prop = {r["doc_id"]: r["cluster_rep"] for r in duplicate_clusters(df).collect()}
    assert star == prop
    assert star[12] == 1 and star[22] == 20 and star[31] == 30
    assert set(star) == set(range(1, 13)) | {20, 21, 22, 30, 31}


def test_star_contraction_handles_unordered_and_duplicate_pairs(spark):
    from cnics_to_fhir_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(
        [(5, 3), (3, 5), (5, 3), (7, 9), (9, 8)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["cluster_rep"] for r in connected_components_star(df).collect()}
    assert out == {3: 3, 5: 3, 7: 7, 8: 7, 9: 7}


def test_star_contraction_keeps_self_pair_ids(spark):
    """A degenerate self-pair contributes no edge but its id must still
    get a row — same contract as duplicate_clusters."""
    from cnics_to_fhir_spark.operators.dedup import duplicate_clusters
    from cnics_to_fhir_spark.operators.graph import connected_components_star

    df = spark.createDataFrame([(7, 7), (1, 2)], "id_a long, id_b long")
    star = {r["doc_id"]: r["cluster_rep"] for r in connected_components_star(df).collect()}
    prop = {r["doc_id"]: r["cluster_rep"] for r in duplicate_clusters(df).collect()}
    assert star == prop == {7: 7, 1: 1, 2: 1}


def test_triangle_counts_k4_and_star(spark):
    from cnics_to_fhir_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: every node sits in C(3,2)=3 triangles. Star around
    # 10 has none. Node 5 bridges 1-5, 2-5 forming one extra triangle
    # (1,2,5).
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (10, 11), (10, 12), (10, 13),
             (1, 5), (2, 5)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got[3] == 3 and got[4] == 3
    assert got[1] == 4 and got[2] == 4  # 3 in K4 + (1,2,5)
    assert got[5] == 1
    assert 10 not in got and 11 not in got
    assert sum(got.values()) % 3 == 0  # every triangle counted thrice


def test_pagerank_converged_empty_edges(spark):
    """An empty graph is trivially converged: iters=0, zero rows — not a
    RuntimeError after max_iters of NULL deltas (ADVICE r6 graph.py:102)."""
    from cnics_to_fhir_spark.operators.graph import pagerank_int_converged

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank_int_converged(edges, tol_q=1000, max_iters=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank_q", "iters"]
