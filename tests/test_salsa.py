"""SALSA (engine/algos/salsa.py) — closed-form mirror parity, numpy
power-iteration of the literal two-step chains, and the TKC contrast
with HITS that motivates the operator."""

from __future__ import annotations

import numpy as np
import pytest

from engine.algos.salsa import salsa, salsa_mirror
from tests.conftest import edges_df


def _run(spark, pairs, vertices=None):
    res = salsa(spark, edges_df(spark, pairs), vertices=vertices)
    rows = {r.vid: (r.hub, r.authority) for r in res.scores.collect()}
    return rows, res


def _chain_stationary(pairs):
    """Numpy oracle: iterate the authority chain a <- A_c^T A_r a and the
    hub chain h <- A_r A_c^T h to stationarity, component-weighted by the
    uniform start (the paper's ergodic-average semantics: a uniform start
    preserves each component's share of the walk)."""
    links = sorted(set(pairs))
    hubs = sorted({u for u, _ in links})
    auths = sorted({v for _, v in links})
    hi = {u: i for i, u in enumerate(hubs)}
    ai = {v: i for i, v in enumerate(auths)}
    A = np.zeros((len(hubs), len(auths)))
    for u, v in links:
        A[hi[u], ai[v]] = 1.0
    Ar = A / A.sum(axis=1, keepdims=True)          # row (out-edge) normalized
    Ac = A / A.sum(axis=0, keepdims=True)          # column (in-edge) normalized
    # Authority chain: from v, step back along a uniform in-edge —
    # P(v -> u) = Ac[u, v] (columns of Ac sum to 1) — then forward along a
    # uniform out-edge — P(u -> w) = Ar[u, w]. Hub chain is the reverse.
    Pa = Ac.T @ Ar                                  # auth x auth, rows sum 1
    Ph = Ar @ Ac.T                                  # hub x hub, rows sum 1
    a = np.full(len(auths), 1.0 / len(auths))
    h = np.full(len(hubs), 1.0 / len(hubs))
    for _ in range(2000):
        a = a @ Pa
        h = h @ Ph
    return (
        {u: h[hi[u]] for u in hubs},
        {v: a[ai[v]] for v in auths},
    )


GRAPH = [
    (0, 1), (0, 2), (1, 2), (2, 1), (3, 2), (3, 4), (4, 1),
    # disjoint second component
    (10, 11), (11, 12), (12, 10), (10, 12),
]


def test_mirror_exact(spark):
    rows, res = _run(spark, GRAPH)
    hub, auth = salsa_mirror(GRAPH)
    for v, (h, a) in rows.items():
        assert h == pytest.approx(hub.get(v, 0.0), abs=1e-15)
        assert a == pytest.approx(auth.get(v, 0.0), abs=1e-15)
    # NOT the digraph's 2 weak components: the bipartite support graph of
    # the 3-cycle splits — hub-copy 12 touches only authority-copy 10,
    # disjoint from {h10, h11, a11, a12}. SALSA components are support
    # components (Lempel & Moran §3), and the closed form (verified
    # exactly above) weighs by THOSE.
    assert res.n_components == 3
    # Each score column sums to 1 over the whole graph.
    assert sum(h for h, _ in rows.values()) == pytest.approx(1.0)
    assert sum(a for _, a in rows.values()) == pytest.approx(1.0)


def test_chain_stationary_oracle(spark):
    """The closed form IS the stationary distribution of the literal
    two-step chains (uniform start preserving component shares). The
    chains here are aperiodic (both components contain a length-2 and a
    length-3 authority cycle via the shared vertices), so plain power
    iteration converges."""
    rows, _ = _run(spark, GRAPH)
    hub, auth = _chain_stationary(GRAPH)
    for v, (h, a) in rows.items():
        if v in hub:
            assert h == pytest.approx(hub[v], abs=1e-9)
        if v in auth:
            assert a == pytest.approx(auth[v], abs=1e-9)


def test_tkc_contrast_with_hits(spark):
    """The motivating SALSA property: a big complete community must not
    absorb the score of a disjoint small one (HITS's TKC effect). SALSA
    gives the small component a nonzero share proportional to its size."""
    big = [(u, v) for u in range(5) for v in range(5, 10)]
    small = [(20, 21), (22, 21)]
    rows, _ = _run(spark, big + small)
    assert rows[21][1] > 0.0
    # component authority shares: big side 5 authorities, small 1.
    small_share = rows[21][1]
    assert small_share == pytest.approx(1.0 / 6.0)


def test_hub_only_and_auth_only_vertices(spark):
    pairs = [(0, 1), (0, 2)]
    rows, _ = _run(spark, pairs)
    assert rows[0] == (pytest.approx(1.0), 0.0)
    assert rows[1][0] == 0.0 and rows[1][1] == pytest.approx(0.5)


def test_vertices_padding(spark):
    pairs = [(0, 1)]
    vs = edges_df(spark, [(0, 1), (7, 8)]).selectExpr("src as vid").union(
        edges_df(spark, [(0, 1), (7, 8)]).selectExpr("dst as vid")
    ).distinct()
    rows, _ = _run(spark, pairs, vertices=vs)
    assert rows[7] == (0.0, 0.0) and rows[8] == (0.0, 0.0)


def test_self_loop(spark):
    rows, res = _run(spark, [(0, 0)])
    assert rows[0] == (pytest.approx(1.0), pytest.approx(1.0))
    assert res.n_components == 1
