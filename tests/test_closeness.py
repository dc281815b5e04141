"""Closeness centrality vs networkx — exact with all-vertex pivots (both
wf_improved settings, directed + undirected + disconnected), and the
pivot-sample estimator vs a brute python computation of the same
plug-in formula."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.closeness import closeness
from tests.conftest import edges_df, vertices_df


def _scores(res):
    return {r.vid: r.closeness for r in res.scores.collect()}


HAND_GRAPHS = {
    "path": [(i, i + 1) for i in range(5)],
    "diamond": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
    "star_out": [(0, i) for i in range(1, 6)],
    "cycle": [(i, (i + 1) % 6) for i in range(6)],
    "two_components": [(0, 1), (1, 2), (10, 11)],
}


@pytest.mark.parametrize("name", sorted(HAND_GRAPHS))
@pytest.mark.parametrize("wf", [True, False])
def test_exact_closeness_hand_graphs(spark, name, wf):
    pairs = HAND_GRAPHS[name]
    g = nx.DiGraph(pairs)
    res = closeness(spark, edges_df(spark, pairs), wf_improved=wf)
    got = _scores(res)
    want = nx.closeness_centrality(g, wf_improved=wf)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (v, got, want)


def test_exact_closeness_random_digraph(spark):
    g = nx.gnm_random_graph(40, 140, seed=23, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    res = closeness(spark, edges_df(spark, list(g.edges)))
    got = _scores(res)
    want = nx.closeness_centrality(g)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_exact_closeness_undirected_view(spark):
    g = nx.gnm_random_graph(30, 70, seed=7)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    pairs = list(g.edges) + [(b, a) for a, b in g.edges]
    res = closeness(spark, edges_df(spark, pairs))
    got = _scores(res)
    want = nx.closeness_centrality(g)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def _plugin_estimate(g, pivots, n_piv, wf):
    """The documented estimator, brute-forced in python over nx distances."""
    out = {}
    dist_from = {s: nx.single_source_shortest_path_length(g, s) for s in pivots}
    for v in g.nodes:
        k_v = n_piv - (1 if v in pivots else 0)
        reach = [dist_from[s][v] for s in pivots if s != v and v in dist_from[s]]
        t = sum(reach)
        if t == 0:
            out[v] = 0.0
            continue
        c = len(reach) / t
        if wf:
            c *= len(reach) / k_v
        out[v] = c
    return out


@pytest.mark.parametrize("wf", [True, False])
def test_pivot_sample_matches_plugin_formula(spark, wf):
    g = nx.gnm_random_graph(35, 120, seed=31, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    pivots = sorted(g.nodes)[:8]
    res = closeness(
        spark,
        edges_df(spark, list(g.edges)),
        pivots=vertices_df(spark, pivots).select("vid"),
        wf_improved=wf,
    )
    assert res.pivots == 8
    got = _scores(res)
    want = _plugin_estimate(g, set(pivots), 8, wf)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_all_pivots_equals_default(spark):
    pairs = HAND_GRAPHS["diamond"]
    g = nx.DiGraph(pairs)
    res = closeness(
        spark,
        edges_df(spark, pairs),
        pivots=vertices_df(spark, sorted(g.nodes)).select("vid"),
    )
    got = _scores(res)
    want = _scores(closeness(spark, edges_df(spark, pairs)))
    assert got == want


def test_cap_violation_raises(spark):
    pairs = [(i, i + 1) for i in range(6)]
    with pytest.raises(ValueError, match="max_iter"):
        closeness(spark, edges_df(spark, pairs), max_iter=2)


# ---------------- harmonic centrality ----------------

from engine.algos.closeness import harmonic  # noqa: E402


@pytest.mark.parametrize("name", sorted(HAND_GRAPHS))
def test_exact_harmonic_hand_graphs(spark, name):
    pairs = HAND_GRAPHS[name]
    g = nx.DiGraph(pairs)
    res = harmonic(spark, edges_df(spark, pairs))
    got = {r.vid: r.harmonic for r in res.scores.collect()}
    want = nx.harmonic_centrality(g)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (v, got, want)


def test_exact_harmonic_random_digraph(spark):
    g = nx.gnm_random_graph(40, 140, seed=29, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    res = harmonic(spark, edges_df(spark, list(g.edges)))
    got = {r.vid: r.harmonic for r in res.scores.collect()}
    want = nx.harmonic_centrality(g)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_sampled_harmonic_plugin_formula(spark):
    g = nx.gnm_random_graph(30, 100, seed=41, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    pivots = sorted(g.nodes)[:6]
    res = harmonic(
        spark, edges_df(spark, list(g.edges)),
        pivots=vertices_df(spark, pivots).select("vid"),
    )
    got = {r.vid: r.harmonic for r in res.scores.collect()}
    n = g.number_of_nodes()
    pv = set(pivots)
    dist_from = {s: nx.single_source_shortest_path_length(g, s) for s in pv}
    for v in g.nodes:
        k_v = len(pv) - (1 if v in pv else 0)
        h = sum(
            1.0 / dist_from[s][v]
            for s in pv if s != v and v in dist_from[s]
        )
        want = (n - 1) / k_v * h if k_v else 0.0
        assert got[v] == pytest.approx(want, abs=1e-9), v
