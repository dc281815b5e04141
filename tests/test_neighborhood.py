"""HyperBall neighborhood function: per-vertex HLL ball sizes vs exact BFS
ball sizes (networkx), within HLL tolerance; exact structural properties
(monotonicity, convergence at diameter, determinism) with no tolerance."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.neighborhood import neighborhood_function
from tests.conftest import edges_df


def _exact_balls(g: nx.DiGraph, t: int | None = None) -> dict[int, int]:
    out = {}
    for v in g.nodes:
        lengths = nx.single_source_shortest_path_length(
            g, v, cutoff=t
        )
        out[v] = len(lengths)
    return out


def test_converges_to_reachable_set_sizes(spark):
    """At the fixpoint the ball is the full reachable set; with m=256
    registers and <=60 reachable vertices, linear counting keeps relative
    error well under 10%."""
    g = nx.gnm_random_graph(60, 150, seed=13, directed=True)
    res = neighborhood_function(spark, edges_df(spark, list(g.edges)), p=8)
    assert res.converged
    got = {r.vid: r.ball_size for r in res.balls.collect()}
    want = _exact_balls(g)
    # vertices with no edges never enter the edge table
    want = {v: c for v, c in want.items() if g.degree(v) > 0}
    assert got.keys() == want.keys()
    for v, exact in want.items():
        assert got[v] == pytest.approx(exact, rel=0.10), (v, got[v], exact)


def test_history_monotone_and_total_matches(spark):
    g = nx.gnm_random_graph(40, 100, seed=4, directed=True)
    res = neighborhood_function(spark, edges_df(spark, list(g.edges)), p=8)
    assert res.converged
    # N(t) is monotone non-decreasing and N(final) == sum of ball sizes
    assert all(b >= a - 1e-9 for a, b in zip(res.history, res.history[1:]))
    total = sum(r.ball_size for r in res.balls.collect())
    assert res.history[-1] == pytest.approx(total, rel=1e-9)


def test_path_graph_converges_at_diameter(spark):
    n = 7
    pairs = [(i, i + 1) for i in range(n - 1)]  # directed path 0->...->6
    res = neighborhood_function(spark, edges_df(spark, pairs), p=8)
    assert res.converged
    # fixpoint reached after diameter rounds (+1 round to observe no change)
    assert res.iterations == n  # n-1 growth rounds + 1 confirming round
    got = {r.vid: r.ball_size for r in res.balls.collect()}
    for v in range(n):
        assert got[v] == pytest.approx(n - v, rel=0.08)


def test_undirected_flag_symmetrizes(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    res_d = neighborhood_function(spark, edges_df(spark, pairs), p=8)
    res_u = neighborhood_function(
        spark, edges_df(spark, pairs), p=8, undirected=True
    )
    d = {r.vid: r.ball_size for r in res_d.balls.collect()}
    u = {r.vid: r.ball_size for r in res_u.balls.collect()}
    assert d[3] == pytest.approx(1.0, rel=0.05)  # sink sees only itself
    for v in range(4):  # undirected: everyone reaches everyone
        assert u[v] == pytest.approx(4.0, rel=0.08)


def test_effective_diameter_readout(spark):
    # directed cycle of 10: every ball grows by exactly 1 per round, so
    # N(t) = 10 * min(t+1, 10) up to HLL noise; 90% mass at t ~ 8
    pairs = [(i, (i + 1) % 10) for i in range(10)]
    res = neighborhood_function(spark, edges_df(spark, pairs), p=8)
    assert res.converged
    eff = res.effective_diameter(0.9)
    assert 7.0 <= eff <= 9.0


def test_deterministic_across_runs(spark):
    g = nx.gnm_random_graph(30, 80, seed=21, directed=True)
    e = edges_df(spark, list(g.edges))
    a = {r.vid: r.ball_size for r in neighborhood_function(spark, e, p=6).balls.collect()}
    b = {r.vid: r.ball_size for r in neighborhood_function(spark, e, p=6).balls.collect()}
    assert a == b


def test_p_validation(spark):
    e = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="p must be"):
        neighborhood_function(spark, e, p=3)


def test_harmonic_centrality_estimate(spark):
    """harmonic=True: h(v) = sum over reachable u of 1/d(v,u), within HLL
    tolerance of the exact value (nx.harmonic_centrality computes the
    IN-distance sum, so compare on the reversed digraph)."""
    g = nx.gnm_random_graph(40, 120, seed=8, directed=True)
    res = neighborhood_function(
        spark, edges_df(spark, list(g.edges)), p=8, harmonic=True
    )
    assert res.converged
    got = {r.vid: r.harmonic for r in res.balls.collect()}
    want = nx.harmonic_centrality(g.reverse())
    for v, h in got.items():
        if want[v] == 0:
            assert h == pytest.approx(0.0, abs=0.15)
        else:
            assert h == pytest.approx(want[v], rel=0.20), (v, h, want[v])


def test_harmonic_star_exact_shape(spark):
    # hub -> leaves: h(hub) = n_leaves (all at distance 1); h(leaf) = 0
    pairs = [(0, i) for i in range(1, 9)]
    res = neighborhood_function(spark, edges_df(spark, pairs), p=8, harmonic=True)
    got = {r.vid: r.harmonic for r in res.balls.collect()}
    assert got[0] == pytest.approx(8.0, rel=0.1)
    for leaf in range(1, 9):
        assert got[leaf] == pytest.approx(0.0, abs=0.1)
