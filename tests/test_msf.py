"""Borůvka MSF vs networkx minimum_spanning_tree.

Distinct weights => the MSF is unique => exact edge-set equality. With
ties, any MSF has the same total weight (exchange-argument classic), so we
assert weight equality plus forest validity (right edge count, acyclic,
connects exactly the components networkx finds).
"""

from __future__ import annotations

import networkx as nx

from engine.algos.msf import minimum_spanning_forest
from tests.conftest import edges_df, vertices_df


def _nx_msf_weight(g) -> float:
    return sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(g, data=True)
    )


def _run(spark, pairs, vids=None):
    v = vertices_df(spark, vids) if vids is not None else None
    return minimum_spanning_forest(spark, edges_df(spark, pairs), vertices=v)


def test_distinct_weights_unique_msf_exact(spark):
    g = nx.gnm_random_graph(60, 180, seed=7)
    pairs = []
    for i, (u, v) in enumerate(sorted(g.edges)):
        w = float(1 + (i * 37) % 997) + i * 1e-3  # all distinct
        g[u][v]["weight"] = w
        pairs.append((u, v, w))
    res = _run(spark, pairs)
    want = {
        (min(u, v), max(u, v), d["weight"])
        for u, v, d in nx.minimum_spanning_edges(g, data=True)
    }
    got = {(r.u, r.v, r.weight) for r in res.edges.collect()}
    assert got == want
    assert abs(res.total_weight - _nx_msf_weight(g)) < 1e-9


def test_ties_same_total_weight_valid_forest(spark):
    g = nx.gnm_random_graph(50, 200, seed=11)
    pairs = []
    for u, v in sorted(g.edges):
        w = float(1 + (u + v) % 3)  # heavy ties
        g[u][v]["weight"] = w
        pairs.append((u, v, w))
    res = _run(spark, pairs)
    rows = res.edges.collect()
    assert abs(res.total_weight - _nx_msf_weight(g)) < 1e-9
    f = nx.Graph()
    f.add_nodes_from(g.nodes)
    f.add_edges_from((r.u, r.v) for r in rows)
    assert nx.is_forest(f)
    # spanning: the forest has the same components as the input graph
    assert len(rows) == g.number_of_nodes() - nx.number_connected_components(g)
    want = {frozenset(c) for c in nx.connected_components(g)}
    got = {frozenset(c) for c in nx.connected_components(f)}
    assert got == want


def test_disconnected_forest_and_isolated_vertices(spark):
    pairs = [(0, 1, 3.0), (1, 2, 1.0), (0, 2, 2.0), (10, 11, 5.0)]
    res = _run(spark, pairs, vids=[0, 1, 2, 10, 11, 99])  # 99 isolated
    got = {(r.u, r.v, r.weight) for r in res.edges.collect()}
    assert got == {(1, 2, 1.0), (0, 2, 2.0), (10, 11, 5.0)}
    labels = {r.vid: r.label for r in res.labels.collect()}
    assert labels[0] == labels[1] == labels[2]
    assert labels[10] == labels[11]
    assert labels[99] == 99
    assert len({labels[0], labels[10], labels[99]}) == 3


def test_parallel_edges_and_self_loops_collapse(spark):
    pairs = [(0, 1, 9.0), (1, 0, 2.0), (0, 1, 2.5), (1, 1, 0.1), (1, 2, 4.0)]
    res = _run(spark, pairs)
    got = {(r.u, r.v, r.weight) for r in res.edges.collect()}
    assert got == {(0, 1, 2.0), (1, 2, 4.0)}
    assert abs(res.total_weight - 6.0) < 1e-12


def test_path_graph_conga_line(spark):
    # Worst-case chain hooking: monotone weights make every component point
    # the same way, exercising the pointer-doubling closure depth.
    n = 64
    pairs = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    res = _run(spark, pairs)
    assert res.edges.count() == n - 1  # a path IS its own MST
    assert res.total_weight == sum(range(1, n))
    assert res.labels.select("label").distinct().count() == 1


def test_labels_match_components_random(spark):
    g = nx.gnm_random_graph(70, 90, seed=23)  # sparse => several components
    pairs = [(u, v, float(1 + (u * v) % 7)) for u, v in sorted(g.edges)]
    for (u, v), p in zip(sorted(g.edges), pairs):
        g[u][v]["weight"] = p[2]
    # Explicit vertex set: gnm at this density leaves isolated vertices,
    # which never appear in the edge list — the vertices= path must label
    # them as their own singleton components.
    res = _run(spark, pairs, vids=sorted(g.nodes))
    assert abs(res.total_weight - _nx_msf_weight(g)) < 1e-9
    labels = {r.vid: r.label for r in res.labels.collect()}
    for comp in nx.connected_components(g):
        assert len({labels[v] for v in comp}) == 1
    # distinct components get distinct labels
    reps = [next(iter(c)) for c in nx.connected_components(g)]
    assert len({labels[v] for v in reps}) == len(reps)
