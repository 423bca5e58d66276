"""Link-graph tier: integer PageRank + inlink aggregation (Linkdb/Msg25
analogue).  The Spark iteration is pinned against an independent pure-
Python power iteration with the same integer floor-division semantics."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.graph.linkrank import (
    BASE_SHARE, DAMP_DEN, DAMP_NUM, RANK_SCALE, inlink_counts, pagerank)


def _py_pagerank(edges: list[tuple], nodes: list[int],
                 n_iter: int) -> dict[int, int]:
    edges = sorted(set(edges))
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: RANK_SCALE for v in nodes}
    for _ in range(n_iter):
        inflow: dict[int, int] = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + ranks[s] // deg[s]
        ranks = {v: BASE_SHARE + (DAMP_NUM * inflow.get(v, 0)) // DAMP_DEN
                 for v in nodes}
    return ranks


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1),
    (5, 3),             # 5 is a source-only node
    (1, 2),             # duplicate link — must collapse
]
NODES = [1, 2, 3, 4, 5, 6]   # 6 is isolated; 5 dangling-in, 2 dangling-out?


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_pagerank_matches_python_twin(spark, edges_df):
    nodes = spark.createDataFrame([(v,) for v in NODES], ["node"])
    got = {r["node"]: r["rank"]
           for r in pagerank(edges_df, nodes, n_iter=4).collect()}
    want = _py_pagerank(EDGES, NODES, n_iter=4)
    assert got == want
    # sanity: hub 3 (4 distinct inlinkers) outranks everyone; isolated
    # node 6 sits at the base share
    assert got[3] == max(got.values())
    assert got[6] == BASE_SHARE


def test_pagerank_partition_invariant(spark, edges_df):
    """Integer sums are associative: the result is bit-identical no
    matter how the graph is partitioned (float PageRank would not be)."""
    nodes = spark.createDataFrame([(v,) for v in NODES], ["node"])
    a = sorted(map(tuple, pagerank(edges_df.repartition(1), nodes,
                                   n_iter=3).collect()))
    b = sorted(map(tuple, pagerank(edges_df.repartition(7, "dst"), nodes,
                                   n_iter=3).collect()))
    assert a == b


def test_default_nodes_are_src_union_dst(spark, edges_df):
    got = {r["node"] for r in pagerank(edges_df, n_iter=1).collect()}
    assert got == {1, 2, 3, 4, 5}


def test_inlink_counts(spark, edges_df):
    got = {r["dst"]: r["n_inlinks"]
           for r in inlink_counts(edges_df).collect()}
    assert got == {2: 1, 3: 4, 1: 2}
