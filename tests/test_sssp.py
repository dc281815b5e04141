"""Weighted SSSP vs networkx Dijkstra (exact value match; reachable-only
state; horizon pruning; negative-weight rejection)."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.sssp import shortest_paths
from tests.conftest import edges_df, vertices_df


def _src_df(spark, vids):
    return vertices_df(spark, vids).select("vid")


def _nx_multi_source(g, sources, weight="weight"):
    return nx.multi_source_dijkstra_path_length(g, sources, weight=weight)


def test_single_source_weighted_exact(spark):
    pairs = [
        (0, 1, 4.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0), (2, 3, 5.0),
        (3, 4, 3.0), (5, 4, 1.0),  # 5 unreachable from 0
    ]
    g = nx.DiGraph()
    g.add_weighted_edges_from(pairs)
    res = shortest_paths(spark, edges_df(spark, pairs), _src_df(spark, [0]))
    assert res.converged
    got = {r.vid: r.dist for r in res.distances.collect()}
    want = nx.single_source_dijkstra_path_length(g, 0)
    assert got == want  # integer-valued doubles: exact
    assert 5 not in got  # unreachable vertices never enter the state


def test_multi_source_random_graph(spark):
    rng = nx.gnm_random_graph(80, 300, seed=17, directed=True)
    g = nx.DiGraph()
    for i, (u, v) in enumerate(rng.edges):
        g.add_edge(u, v, weight=float(1 + (i * 7) % 5))
    pairs = [(u, v, d["weight"]) for u, v, d in g.edges(data=True)]
    srcs = [0, 13, 42]
    res = shortest_paths(spark, edges_df(spark, pairs), _src_df(spark, srcs))
    assert res.converged
    got = {r.vid: r.dist for r in res.distances.collect()}
    want = _nx_multi_source(g, srcs)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_unweighted_is_bfs_depth(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)]
    g = nx.DiGraph(pairs)
    res = shortest_paths(
        spark, edges_df(spark, pairs), _src_df(spark, [0]), weighted=False
    )
    got = {r.vid: r.dist for r in res.distances.collect()}
    want = nx.single_source_shortest_path_length(g, 0)
    assert got == {v: float(d) for v, d in want.items()}


def test_parallel_edges_keep_cheapest(spark):
    pairs = [(0, 1, 9.0), (0, 1, 2.0), (1, 2, 1.0)]
    res = shortest_paths(spark, edges_df(spark, pairs), _src_df(spark, [0]))
    got = {r.vid: r.dist for r in res.distances.collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 3.0}


def test_max_dist_horizon_prunes(spark):
    pairs = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    res = shortest_paths(
        spark, edges_df(spark, pairs), _src_df(spark, [0]), max_dist=2.0
    )
    got = {r.vid: r.dist for r in res.distances.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_negative_weight_rejected(spark):
    pairs = [(0, 1, -1.0)]
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(spark, edges_df(spark, pairs), _src_df(spark, [0]))


def test_null_weight_rejected(spark):
    rows = [(0, 1, "x", 1.0), (1, 2, "x", None)]
    e = spark.createDataFrame(
        rows, "src long, dst long, rel string, weight double"
    )
    with pytest.raises(ValueError, match="non-null"):
        shortest_paths(spark, e, _src_df(spark, [0]))
