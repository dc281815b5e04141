"""iFUB exact diameter vs nx.diameter (exact on every connected case),
early-termination evidence (bfs_count << V on hub graphs), chunked fringe
equivalence, disconnected/cap/degenerate failure modes."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.diameter import diameter
from tests.conftest import edges_df


def _run(spark, g, **kw):
    return diameter(spark, edges_df(spark, list(g.edges())), **kw)


def test_classic_shapes_exact(spark):
    for g, want in [
        (nx.path_graph(10), 9),
        (nx.cycle_graph(10), 5),
        (nx.star_graph(7), 2),
        (nx.complete_graph(6), 1),
        (nx.barbell_graph(5, 4), 7),
    ]:
        res = _run(spark, g)
        assert res.diameter == want == nx.diameter(g)
        # the certificate is a real witness
        assert nx.eccentricity(g, res.certificate) == want


def test_random_connected_exact(spark):
    for seed in (3, 11):
        g = nx.gnm_random_graph(60, 110, seed=seed)
        g = g.subgraph(max(nx.connected_components(g), key=len)).copy()
        res = _run(spark, g)
        assert res.diameter == nx.diameter(g)


def test_star_terminates_without_scanning_all(spark):
    # hub graph: root = hub (ecc 1 after... ecc = 2 from leaves); iFUB
    # should finish after the first fringe level, far below V BFS runs
    g = nx.star_graph(40)
    res = _run(spark, g)
    assert res.diameter == 2
    assert res.root == 0  # the hub is the highest-degree root
    assert res.root_ecc == 1
    # 1 root BFS + the 40 leaves at level 1 is the worst case; early
    # termination on lb > 2*(i-1) must fire after the first chunk level
    assert res.levels_processed == 1


def test_chunked_fringe_matches_unchunked(spark):
    g = nx.gnm_random_graph(50, 90, seed=5)
    g = g.subgraph(max(nx.connected_components(g), key=len)).copy()
    a = _run(spark, g)
    b = _run(spark, g, max_bfs_batch=3)
    assert a.diameter == b.diameter == nx.diameter(g)
    assert b.bfs_count == a.bfs_count  # same sources, just more chunks


def test_directed_input_is_symmetrized(spark):
    # one-directional path: undirected diameter is still the path length
    pairs = [(i, i + 1) for i in range(6)]
    res = diameter(spark, edges_df(spark, pairs))
    assert res.diameter == 6


def test_disconnected_raises(spark):
    pairs = [(0, 1), (1, 2), (10, 11)]
    with pytest.raises(ValueError, match="disconnected"):
        diameter(spark, edges_df(spark, pairs))


def test_cap_and_empty_raise(spark):
    pairs = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="max_iter"):
        diameter(spark, edges_df(spark, pairs), max_iter=3)
    with pytest.raises(ValueError, match="no non-loop"):
        diameter(spark, edges_df(spark, [(4, 4)]))
