"""Unit tests for graph operators (operators/graph.py)."""

from __future__ import annotations

from pipegen_spark.operators import graph as gr


def _ranks(spark, edge_list, iters=3):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["id"]: r["rank_micro"]
        for r in gr.pagerank_fixed(df, iters=iters).collect()
    }


def test_pagerank_hub_outranks_leaves(spark):
    # Undirected star: hub 0 connected to leaves 1..5.
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = _ranks(spark, edges)
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    # Leaves are symmetric — identical integer ranks.
    assert len({ranks[i] for i in range(1, 6)}) == 1


def test_pagerank_mass_approximately_conserved(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    ranks = _ranks(spark, edges, iters=4)
    total = sum(ranks.values())
    # DIV truncation loses < (n_nodes + n_edges) units per iteration.
    assert gr.PR_SCALE - 4 * 6 <= total <= gr.PR_SCALE
    # Symmetric ring: all equal.
    assert len(set(ranks.values())) == 1


def test_pagerank_deterministic(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)]
    assert _ranks(spark, edges) == _ranks(spark, edges)


def test_pagerank_empty_edge_set_yields_no_rows(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert gr.pagerank_fixed(df).collect() == []
