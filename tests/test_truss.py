"""k-truss decomposition: edge h-index-fixpoint truss numbers must equal
the networkx-derived trussness (max k with the edge in ``nx.k_truss``)
exactly; single-k peel must equal ``nx.k_truss(g, k).edges``."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.truss import k_truss, truss_numbers
from tests.conftest import edges_df

HAND_GRAPHS = {
    # K5: every edge in 3 triangles -> trussness 5 throughout
    "clique5": [(i, j) for i in range(5) for j in range(i + 1, 5)],
    # triangle with a pendant edge: triangle edges 3, pendant 2
    "triangle_tail": [(0, 1), (1, 2), (2, 0), (2, 3)],
    # path: no triangles, all edges trussness 2
    "path": [(i, i + 1) for i in range(6)],
    # two K4s sharing one edge: shared edge sees 4 triangles but its
    # trussness is still 4 (peeling either K4 alone sustains k=4, not 5)
    "two_k4_shared_edge": [(i, j) for i in range(4) for j in range(i + 1, 4)]
    + [(0, 4), (0, 5), (1, 4), (1, 5), (4, 5)],
    # chain of triangles sharing vertices: the slow-peel regime
    "triangle_chain": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2),
                       (4, 5), (5, 6), (6, 4)],
}


def _nx_graph(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return g


def _nx_trussness(g):
    """(a, b) -> max k with the edge in nx.k_truss(g, k); every edge of a
    simple graph is in the 2-truss."""
    out = {tuple(sorted(e)): 2 for e in g.edges}
    k = 3
    while True:
        sub = nx.k_truss(g, k)
        if sub.number_of_edges() == 0:
            return out
        for e in sub.edges:
            out[tuple(sorted(e))] = k
        k += 1


@pytest.mark.parametrize("name", sorted(HAND_GRAPHS))
def test_truss_numbers_hand_graphs(spark, name):
    pairs = HAND_GRAPHS[name]
    res = truss_numbers(spark, edges_df(spark, pairs))
    assert res.converged
    got = {(r.a, r.b): r.truss for r in res.truss.collect()}
    assert got == _nx_trussness(_nx_graph(pairs))


def test_truss_numbers_random_graph(spark):
    g = nx.gnm_random_graph(60, 240, seed=11)
    res = truss_numbers(spark, edges_df(spark, list(g.edges)))
    assert res.converged
    got = {(r.a, r.b): r.truss for r in res.truss.collect()}
    assert got == _nx_trussness(g)


@pytest.mark.parametrize("k", [3, 4])
def test_k_truss_matches_networkx(spark, k):
    g = nx.gnm_random_graph(60, 240, seed=11)
    ours = k_truss(spark, edges_df(spark, list(g.edges)), k)
    got = {(r.a, r.b) for r in ours.collect()}
    want = {tuple(sorted(e)) for e in nx.k_truss(g, k).edges}
    assert got == want


def test_k_truss_triangle_free_graph_is_empty_for_k3(spark):
    pairs = [(i, i + 1) for i in range(6)]
    assert k_truss(spark, edges_df(spark, pairs), 3).count() == 0


def test_k_truss_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        k_truss(spark, edges_df(spark, [(0, 1)]), 1)


def test_k_truss_cap_fails_loudly(spark):
    # a chain of triangles peels one triangle per round at k=4 cap pressure:
    # with max_iter=1 on a graph that needs >=2 rounds the call must raise,
    # never return a partially-peeled edge set
    pairs = HAND_GRAPHS["two_k4_shared_edge"]
    with pytest.raises(RuntimeError, match="peel fixpoint"):
        k_truss(spark, edges_df(spark, pairs), 5, max_iter=1)
