"""Matching contraction: weight conservation, map/edge consistency (the
coarse graph equals contracting the input through the composed vertex
map — holds at any level count by associativity), supervertex fixpoint,
shrinkage, determinism, validation."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.coarsen import coarsen_graph
from tests.conftest import edges_df


def _check_consistency(pairs, res):
    vmap = {r.vid: r.cvid for r in res.vertex_map.collect()}
    got = {(r.src, r.dst): r.weight for r in res.edges.collect()}
    # contract the ORIGINAL simple graph through the composed map
    merged = {}
    for u, v in pairs:
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        merged[key] = merged.get(key, 0.0) + 1.0
    want, internal = {}, 0.0
    for (u, v), w in merged.items():
        a, b = vmap[u], vmap[v]
        if a == b:
            internal += w
        else:
            k = (min(a, b), max(a, b))
            want[k] = want.get(k, 0.0) + w
    assert got == want
    assert res.internal_weight == pytest.approx(internal)
    # conservation
    assert sum(got.values()) + internal == pytest.approx(sum(merged.values()))
    # supervertices are fixpoints of the map
    for cv in set(vmap.values()):
        assert vmap[cv] == cv
    return vmap


def test_single_level_consistency_and_shrinkage(spark):
    g = nx.gnm_random_graph(40, 120, seed=8)
    pairs = list(g.edges())
    res = coarsen_graph(spark, edges_df(spark, pairs), levels=1)
    vmap = _check_consistency(pairs, res)
    assert res.levels_done == 1
    # a maximal matching on a connected-ish graph contracts many pairs
    assert len(set(vmap.values())) < len(vmap)
    res.edges.unpersist()
    res.vertex_map.unpersist()


def test_multi_level_consistency(spark):
    g = nx.gnm_random_graph(60, 200, seed=15)
    pairs = list(g.edges())
    res = coarsen_graph(spark, edges_df(spark, pairs), levels=3)
    vmap = _check_consistency(pairs, res)
    assert res.levels_done == 3
    n0 = len(vmap)
    assert len(set(vmap.values())) <= n0 // 2  # >= half gone over 3 levels
    res.edges.unpersist()
    res.vertex_map.unpersist()


def test_deterministic_and_stops_when_dry(spark):
    pairs = [(0, 1), (2, 3)]
    a = coarsen_graph(spark, edges_df(spark, pairs), levels=5)
    b = coarsen_graph(spark, edges_df(spark, pairs), levels=5)
    assert sorted(map(tuple, a.vertex_map.collect())) == sorted(
        map(tuple, b.vertex_map.collect())
    )
    # two disjoint edges contract fully in level 1; level 2 has no edges
    assert a.levels_done == 1
    assert a.edges.count() == 0
    assert a.internal_weight == 2.0
    for r in (a, b):
        r.edges.unpersist()
        r.vertex_map.unpersist()


def test_validation(spark):
    with pytest.raises(ValueError, match="levels"):
        coarsen_graph(spark, edges_df(spark, [(0, 1)]), levels=0)
