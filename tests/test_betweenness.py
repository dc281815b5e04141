"""Brandes betweenness vs networkx — exact with all-vertex pivots, and the
pivot-subset semantics vs betweenness_centrality_subset."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.betweenness import betweenness
from tests.conftest import edges_df, vertices_df


def _scores(res):
    return {r.vid: r.betweenness for r in res.scores.collect()}


def _nx_subset(g, sources):
    return nx.betweenness_centrality_subset(
        g, sources=sources, targets=list(g.nodes), normalized=False
    )


HAND_GRAPHS = {
    "path": [(i, i + 1) for i in range(5)],
    "diamond": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
    "star_out": [(0, i) for i in range(1, 6)],
    "cycle": [(i, (i + 1) % 6) for i in range(6)],
}


@pytest.mark.parametrize("name", sorted(HAND_GRAPHS))
def test_exact_betweenness_hand_graphs(spark, name):
    pairs = HAND_GRAPHS[name]
    g = nx.DiGraph(pairs)
    res = betweenness(spark, edges_df(spark, pairs))
    got = _scores(res)
    want = nx.betweenness_centrality(g, normalized=False)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (v, got, want)


def test_exact_betweenness_random_digraph(spark):
    g = nx.gnm_random_graph(40, 140, seed=19, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    res = betweenness(spark, edges_df(spark, list(g.edges)))
    got = _scores(res)
    want = nx.betweenness_centrality(g, normalized=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_pivot_subset_matches_nx_subset(spark):
    g = nx.gnm_random_graph(35, 120, seed=27, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    pivots = sorted(g.nodes)[:7]
    res = betweenness(
        spark,
        edges_df(spark, list(g.edges)),
        pivots=vertices_df(spark, pivots).select("vid"),
    )
    assert res.pivots == 7
    got = _scores(res)
    want = _nx_subset(g, pivots)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (v, got[v], want[v])


def test_sigma_multiplicity(spark):
    # two parallel 2-hop routes 0->{1,2}->3 then 3->4: vertex 3 carries
    # all 0->4 paths; 1 and 2 each carry half of 0->3 and 0->4
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    res = betweenness(spark, edges_df(spark, pairs))
    got = _scores(res)
    assert got[1] == pytest.approx(1.0)   # 0.5 (0->3) + 0.5 (0->4)
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(3.0)   # 0->4, 1->4, 2->4
