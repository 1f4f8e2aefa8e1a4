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
