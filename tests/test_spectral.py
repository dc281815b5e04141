"""Katz / eigenvector centrality vs networkx's pure-python power
iterations (katz_centrality / eigenvector_centrality — neither needs
scipy). Same fixtures style as the other algo suites: small hand graphs
plus a seeded random graph, exact-semantics parity asserted at 1e-8."""

import networkx as nx
import numpy as np
import pytest

from engine.algos.spectral import eigenvector_centrality, katz_centrality
from tests.conftest import edges_df


def _rand_pairs(seed=7, n=40, p=0.12):
    g = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    return [(u, v) for u, v in g.edges]


GRAPHS = {
    "path": [(0, 1), (1, 2), (2, 3), (3, 4)],
    "cycle_chord": [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)],
    "star_in": [(1, 0), (2, 0), (3, 0), (4, 0)],
    "random": _rand_pairs(),
}


def _scores(df):
    return {r.vid: r.value for r in df.collect()}


# ---------------- Katz ----------------


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_katz_matches_networkx(spark, name):
    pairs = GRAPHS[name]
    g = nx.DiGraph(pairs)
    res = katz_centrality(spark, edges_df(spark, pairs), alpha=0.1, beta=1.0)
    ref = nx.katz_centrality(g, alpha=0.1, beta=1.0, tol=1e-6, max_iter=1000)
    got = _scores(res.scores)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-8), (name, v)


def test_katz_weighted_and_unnormalized(spark):
    pairs = [(0, 1, 2.0), (1, 2, 0.5), (2, 0, 1.0), (0, 2, 3.0)]
    g = nx.DiGraph()
    g.add_weighted_edges_from(pairs)
    res = katz_centrality(
        spark, edges_df(spark, pairs), alpha=0.05, beta=0.3,
        normalized=False, weighted=True,
    )
    ref = nx.katz_centrality(
        g, alpha=0.05, beta=0.3, tol=1e-6, max_iter=1000,
        normalized=False, weight="weight",
    )
    got = _scores(res.scores)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-10)


def test_katz_isolated_vertex_gets_beta(spark):
    from tests.conftest import vertices_df

    res = katz_centrality(
        spark, edges_df(spark, [(0, 1)]), vertices=vertices_df(spark, [0, 1, 9]),
        alpha=0.1, normalized=False,
    )
    got = _scores(res.scores)
    assert got[9] == pytest.approx(1.0, abs=1e-9)  # beta only
    assert got[1] == pytest.approx(1.0 + 0.1, abs=1e-6)


def test_katz_diverges_loudly(spark):
    # alpha = 1.0 >= 1/lambda_max on a cycle (lambda_max = 1): series diverges
    with pytest.raises(RuntimeError, match="converge"):
        katz_centrality(
            spark, edges_df(spark, [(0, 1), (1, 0)]), alpha=1.5, max_iter=25,
        )


# ---------------- eigenvector ----------------


def _sym(pairs):
    return sorted({(u, v) for u, v in pairs} | {(v, u) for u, v in pairs})


@pytest.mark.parametrize("name", ["path", "cycle_chord", "random"])
def test_eigenvector_matches_networkx_undirected(spark, name):
    pairs = GRAPHS[name]
    g = nx.Graph(pairs)
    res = eigenvector_centrality(
        spark, edges_df(spark, _sym(pairs)), max_iter=1000, tol=1e-8,
    )
    ref = nx.eigenvector_centrality(g, max_iter=1000, tol=1e-8)
    got = _scores(res.scores)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-6), (name, v)


def test_eigenvector_directed_cycle_uniform(spark):
    # strongly connected 4-cycle: dominant eigenvector is uniform
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    res = eigenvector_centrality(spark, edges_df(spark, pairs), tol=1e-10, max_iter=500)
    vals = np.array(sorted(_scores(res.scores).values()))
    assert np.allclose(vals, 0.5, atol=1e-6)  # L2-normalized uniform over 4


def test_eigenvector_weighted_matches_networkx(spark):
    pairs = [(0, 1, 2.0), (1, 0, 2.0), (1, 2, 1.0), (2, 1, 1.0), (2, 0, 3.0), (0, 2, 3.0)]
    g = nx.Graph()
    g.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0)])
    res = eigenvector_centrality(
        spark, edges_df(spark, pairs), weighted=True, tol=1e-9, max_iter=1000,
    )
    ref = nx.eigenvector_centrality(g, weight="weight", tol=1e-9, max_iter=1000)
    got = _scores(res.scores)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-6)


def test_eigenvector_nonconvergence_raises(spark):
    # bipartite star oscillates under plain power iteration; the +I trick
    # converges it, so force failure with max_iter=1 instead
    with pytest.raises(RuntimeError, match="converge"):
        eigenvector_centrality(
            spark, edges_df(spark, _sym([(0, 1), (0, 2)])), max_iter=1, tol=1e-12,
        )


def test_plan_stats_stay_bounded_across_iterations(spark):
    # Regression: Spark 4.1 localCheckpoint carries origin plan stats, and
    # a loop body with two state references SQUARES the carried BigInt per
    # iteration (minutes/iteration in BigInteger.multiplyToomCook3 past
    # ~iteration 20). fresh_checkpoint strips the carryover; a long run
    # must end with a constant-size stat, not a 10^7-digit one.
    from engine.algos.loopstate import plan_stat_digits

    pairs = _sym(GRAPHS["random"])
    res = eigenvector_centrality(
        spark, edges_df(spark, pairs), tol=1e-12, max_iter=300,
    )
    assert res.iterations > 20
    assert plan_stat_digits(res.scores) < 60

    res2 = katz_centrality(
        spark, edges_df(spark, pairs), alpha=0.05, tol=1e-12, max_iter=300,
    )
    assert res2.iterations > 10
    assert plan_stat_digits(res2.scores) < 60


def test_null_weight_rejected(spark):
    df = spark.createDataFrame(
        [(0, 1, "x", None)], "src long, dst long, rel string, weight double"
    )
    with pytest.raises(ValueError, match="non-null"):
        katz_centrality(spark, df, weighted=True)
