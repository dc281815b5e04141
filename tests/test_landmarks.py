"""ALT distance oracle (engine/algos/landmarks.py) vs networkx: exact
per-landmark distance tables, bound validity lower <= d <= upper on every
reachable pair, interval collapse when a landmark IS an endpoint,
unreachable handling, degree-based selection, and the convergence
contract."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.landmarks import (
    build_distance_oracle,
    estimate_distance,
    pick_landmarks_by_degree,
)
from tests.conftest import edges_df


def _weighted_digraph(seed=7, n=25, m=80):
    g = nx.gnm_random_graph(n, m, seed=seed, directed=True)
    for i, (u, v) in enumerate(g.edges):
        g[u][v]["weight"] = 1.0 + (i * 13 % 7)
    return g


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_landmark_tables_exact(spark):
    g = _weighted_digraph()
    lms = [0, 1, 2]
    orc = build_distance_oracle(
        spark, edges_df(spark, [(u, v, d["weight"]) for u, v, d in
                                g.edges(data=True)]),
        landmarks=lms,
    )
    assert orc.converged
    fwd = {(r.lid, r.vid): r.dist for r in orc.fwd.collect()}
    bwd = {(r.lid, r.vid): r.dist for r in orc.bwd.collect()}
    for L in lms:
        want_f = nx.single_source_dijkstra_path_length(g, L)
        want_b = nx.single_source_dijkstra_path_length(g.reverse(), L)
        assert {v: d for (l, v), d in fwd.items() if l == L} == pytest.approx(want_f)
        assert {v: d for (l, v), d in bwd.items() if l == L} == pytest.approx(want_b)


def test_bounds_bracket_true_distance(spark):
    g = _weighted_digraph(seed=3)
    e = edges_df(spark, [(u, v, d["weight"]) for u, v, d in g.edges(data=True)])
    orc = build_distance_oracle(spark, e, landmarks=[0, 5, 10, 15])
    true_d = dict(nx.all_pairs_dijkstra_path_length(g))
    pairs = [(s, t) for s in range(0, 25, 3) for t in range(1, 25, 4) if s != t]
    got = {(r.src, r.dst): r for r in
           estimate_distance(orc, _pairs_df(spark, pairs)).collect()}
    assert set(got) == set(pairs)
    checked_reach = checked_unreach = 0
    for (s, t), r in got.items():
        if t in true_d.get(s, {}):
            d = true_d[s][t]
            assert r.lower <= d + 1e-9, (s, t, r, d)
            if r.upper is not None:
                assert r.upper >= d - 1e-9, (s, t, r, d)
            checked_reach += 1
        else:
            assert r.upper is None, (s, t, r)  # no landmark route can exist
            checked_unreach += 1
    assert checked_reach > 10


def test_interval_collapses_when_landmark_is_endpoint(spark):
    g = _weighted_digraph(seed=11)
    e = edges_df(spark, [(u, v, d["weight"]) for u, v, d in g.edges(data=True)])
    orc = build_distance_oracle(spark, e, landmarks=[4])
    want = nx.single_source_dijkstra_path_length(g, 4)
    pairs = [(4, t) for t in want if t != 4]
    got = estimate_distance(orc, _pairs_df(spark, pairs)).collect()
    assert len(got) == len(pairs)
    for r in got:
        d = want[r.dst]
        assert r.lower == pytest.approx(d, abs=1e-9)
        assert r.upper == pytest.approx(d, abs=1e-9)


def test_degree_landmark_selection(spark):
    pairs = [(0, i) for i in range(1, 6)] + [(1, i) for i in range(2, 5)] + [(2, 3)]
    e = edges_df(spark, pairs)
    assert pick_landmarks_by_degree(e, 2) == [0, 1]
    orc = build_distance_oracle(spark, e, n_landmarks=2, weighted=False)
    assert orc.landmarks == (0, 1)


def test_contracts_fail_loudly(spark):
    e = edges_df(spark, [(0, 1), (1, 2)])
    with pytest.raises(ValueError, match="no landmarks"):
        build_distance_oracle(spark, e, landmarks=[])
    bad = edges_df(spark, [(0, 1, -2.0)])
    with pytest.raises(ValueError, match="non-negative"):
        build_distance_oracle(spark, bad, landmarks=[0])
    # truncated loop -> oracle refuses to answer
    chain = edges_df(spark, [(i, i + 1) for i in range(12)])
    orc = build_distance_oracle(spark, chain, landmarks=[0], max_iter=3)
    assert not orc.converged
    with pytest.raises(ValueError, match="truncated"):
        estimate_distance(orc, _pairs_df(spark, [(0, 5)]))
