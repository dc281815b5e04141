"""Densest subgraph (engine/algos/densest.py) — mirror-exact parity with
the pure-Python batched peel, brute-force optimality bound on tiny graphs,
and structural sanity on the fixture graph."""

from __future__ import annotations

import itertools

import pytest

from engine.algos.densest import densest_mirror, densest_subgraph
from tests.conftest import edges_df


def _spark_result(spark, pairs, eps=0.1):
    res = densest_subgraph(spark, edges_df(spark, pairs), epsilon=eps)
    verts = sorted(r.vid for r in res.vertices.collect())
    return verts, res


def _brute_rho_star(pairs):
    """Exact densest density by enumerating all vertex subsets (tiny n)."""
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    vs = sorted({x for e in und for x in e})
    best = 0.0
    for k in range(1, len(vs) + 1):
        for sub in itertools.combinations(vs, k):
            s = set(sub)
            m = sum(1 for a, b in und if a in s and b in s)
            best = max(best, m / len(s))
    return best


CLIQUE_PLUS_TAIL = (
    # K5 on 0..4 (rho = 2.0) plus a long path tail that dilutes the whole
    # graph's density — the peel must find the clique.
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(4, 10), (10, 11), (11, 12), (12, 13), (13, 14)]
)


def test_clique_plus_tail_finds_clique(spark):
    verts, res = _spark_result(spark, CLIQUE_PLUS_TAIL, eps=0.1)
    assert verts == [0, 1, 2, 3, 4]
    assert res.density == pytest.approx(2.0)
    assert res.n_vertices == 5 and res.n_edges == 10


@pytest.mark.parametrize("eps", [0.0, 0.1, 0.5])
def test_mirror_exact_parity(spark, eps):
    pairs = CLIQUE_PLUS_TAIL + [(2, 20), (20, 21), (21, 2), (7, 8)]
    verts, res = _spark_result(spark, pairs, eps=eps)
    mverts, mrho, mrounds = densest_mirror(pairs, epsilon=eps)
    assert verts == mverts
    assert res.density == pytest.approx(mrho, abs=0)
    assert res.rounds == mrounds


def test_approximation_bound_brute_force(spark):
    # Random-ish small graph: guarantee rho(best) >= rho* / (2 (1+eps)).
    pairs = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
        (5, 6), (6, 7), (7, 8), (8, 6), (1, 5), (0, 7), (3, 8),
    ]
    eps = 0.1
    verts, res = _spark_result(spark, pairs, eps=eps)
    rho_star = _brute_rho_star(pairs)
    assert res.density >= rho_star / (2.0 * (1.0 + eps)) - 1e-12
    # density reported == density recomputed from the returned vertex set
    s = set(verts)
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    m = sum(1 for a, b in und if a in s and b in s)
    assert res.density == pytest.approx(m / len(s))


def test_self_loops_and_duplicates_ignored(spark):
    pairs = [(0, 0), (0, 1), (1, 0), (0, 1), (1, 2), (2, 0)]
    verts, res = _spark_result(spark, pairs)
    assert verts == [0, 1, 2]
    assert res.density == pytest.approx(1.0)  # triangle: 3 edges / 3 verts


def test_epsilon_validation(spark):
    with pytest.raises(ValueError):
        densest_subgraph(spark, edges_df(spark, [(0, 1)]), epsilon=-0.5)


def test_fixture_graph_density_sane(spark, tiny_graph, tiny_nx):
    _, e = tiny_graph
    res = densest_subgraph(spark, e, epsilon=0.2)
    # Whole-graph density is a lower bound for the best peel density.
    und = {(min(u, v), max(u, v)) for u, v in tiny_nx.edges() if u != v}
    n_all = len({x for p in und for x in p})
    assert res.density >= len(und) / n_all - 1e-12
    # Mirror parity at fixture scale too (same batched rule).
    mverts, mrho, _ = densest_mirror(list(tiny_nx.edges()), epsilon=0.2)
    assert res.density == pytest.approx(mrho, abs=0)
    assert sorted(r.vid for r in res.vertices.collect()) == mverts
