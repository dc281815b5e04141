"""t1/t2: degree-ordered triangle counting."""

import random

import pytest

from engine.algos.triangles import triangle_count, triangles_per_vertex
from tests.conftest import edges_df
from tests.oracles import nx_digraph, triangles_oracle

K4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]

HAND = {
    "k4": (K4, 4),
    "star_no_triangles": ([(0, i) for i in range(1, 8)], 0),
    "triangle_with_selfloop_and_dups": ([(0, 1), (1, 2), (2, 0), (0, 0), (1, 2)], 1),
    "two_triangles_shared_edge": ([(0, 1), (1, 2), (2, 0), (1, 3), (3, 2)], 2),
    "empty": ([], 0),
}


@pytest.mark.parametrize("name", sorted(HAND))
def test_hand_graphs(spark, name):
    pairs, expect = HAND[name]
    assert triangle_count(spark, edges_df(spark, pairs)) == expect


def test_corpus_graph_exact(spark, tiny_graph, tiny_nx):
    _, e = tiny_graph
    assert triangle_count(spark, e) == triangles_oracle(tiny_nx)


def test_per_vertex_sums_to_3x_total(spark):
    e = edges_df(spark, K4 + [(3, 4), (4, 5)])
    total = triangle_count(spark, e)
    per_v = triangles_per_vertex(spark, e)
    s = sum(r.triangles for r in per_v.collect())
    assert s == 3 * total


def test_random_graphs_exact(spark):
    rng = random.Random(13)
    for trial in range(3):
        n = rng.randint(4, 25)
        m = rng.randint(0, n * 3)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        g = nx_digraph(range(n), [(a, b, 1.0) for a, b in pairs])
        assert triangle_count(spark, edges_df(spark, pairs)) == triangles_oracle(g)


def test_clustering_coefficients_match_networkx(spark):
    import networkx as nx
    import pytest
    from engine.algos.triangles import clustering_coefficients

    g = nx.gnm_random_graph(50, 160, seed=37)
    got = {
        r.vid: r.clustering
        for r in clustering_coefficients(spark, edges_df(spark, list(g.edges))).collect()
    }
    want = nx.clustering(g)
    want = {v: c for v, c in want.items() if g.degree(v) > 0}
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_transitivity_matches_networkx(spark):
    import networkx as nx
    import pytest
    from engine.algos.triangles import transitivity

    g = nx.gnm_random_graph(40, 120, seed=3)
    got = transitivity(spark, edges_df(spark, list(g.edges)))
    assert got == pytest.approx(nx.transitivity(g), abs=1e-12)
    # wedge-free graph (single edge): defined as 0
    assert transitivity(spark, edges_df(spark, [(0, 1)])) == 0.0
