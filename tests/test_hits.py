"""HITS hubs/authorities vs a pure-python power-iteration oracle.

The oracle replicates networkx.algorithms.link_analysis.hits_alg semantics
(normalized output; per-iteration max-scaling; err = L1 of successive
normalized hub vectors) — nx's own hits() requires scipy, absent from this
container, so the reference loop is inlined here (it is ~20 lines of
public-knowledge power iteration)."""

import numpy as np
import pytest

from engine.algos.hits import hits
from tests.conftest import edges_df


def hits_oracle(nodes, edges, max_iter=100, tol=1e-8):
    nodes = sorted(set(nodes))
    out = {n: [] for n in nodes}
    for s, d in edges:
        if d not in out[s]:
            out[s].append(d)
    h = {n: 1.0 / len(nodes) for n in nodes}
    a = {n: 0.0 for n in nodes}
    for _ in range(max_iter):
        hlast = h
        a = {n: 0.0 for n in nodes}
        for u in nodes:
            for v in out[u]:
                a[v] += hlast[u]
        h = {n: 0.0 for n in nodes}
        for u in nodes:
            for v in out[u]:
                h[u] += a[v]
        mh = max(h.values()) or 1.0
        h = {n: x / mh for n, x in h.items()}
        ma = max(a.values()) or 1.0
        a = {n: x / ma for n, x in a.items()}
        if sum(abs(h[n] - hlast[n]) for n in nodes) < tol:
            break
    sh = sum(h.values()) or 1.0
    sa = sum(a.values()) or 1.0
    return {n: h[n] / sh for n in nodes}, {n: a[n] / sa for n in nodes}


GRAPHS = {
    "star_out": ([(0, i) for i in range(1, 6)]),
    "bipartite_hubs": [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4), (5, 3)],
    "cycle_plus_chord": [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)],
    "self_loop": [(0, 0), (0, 1), (1, 2)],
    "two_components": [(0, 1), (1, 0), (5, 6), (6, 7), (7, 5)],
}


def _vids(pairs):
    return sorted({x for p in pairs for x in p})


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_hits_matches_oracle(spark, name):
    pairs = GRAPHS[name]
    res = hits(spark, edges_df(spark, pairs), tol=1e-10, max_iter=200)
    assert res.converged
    got = {r.vid: (r.hub, r.authority) for r in res.scores.collect()}
    oh, oa = hits_oracle(_vids(pairs), pairs, max_iter=400, tol=1e-10)
    assert set(got) == set(oh)
    for n in oh:
        assert abs(got[n][0] - oh[n]) < 1e-6, (n, got[n][0], oh[n])
        assert abs(got[n][1] - oa[n]) < 1e-6, (n, got[n][1], oa[n])
    hs = sum(v[0] for v in got.values())
    as_ = sum(v[1] for v in got.values())
    assert abs(hs - 1.0) < 1e-9 and abs(as_ - 1.0) < 1e-9


def test_hits_isolated_vertices_score_zero(spark):
    from tests.conftest import vertices_df

    res = hits(
        spark,
        edges_df(spark, [(0, 1), (1, 2)]),
        vertices=vertices_df(spark, [0, 1, 2, 9]),
        tol=1e-10,
    )
    got = {r.vid: (r.hub, r.authority) for r in res.scores.collect()}
    assert got[9] == (0.0, 0.0)
    assert set(got) == {0, 1, 2, 9}


def test_hits_edgeless_graph(spark):
    from tests.conftest import vertices_df
    from pyspark.sql import functions as F  # noqa: F401

    e = edges_df(spark, [(0, 1)]).filter("src > 100")  # empty edge set
    res = hits(spark, e, vertices=vertices_df(spark, [0, 1]))
    assert res.converged
    got = {r.vid: (r.hub, r.authority) for r in res.scores.collect()}
    assert got == {0: (0.0, 0.0), 1: (0.0, 0.0)}
