"""Link-prediction scores (common neighbors / Jaccard / Adamic–Adar) vs
networkx's generators and a brute all-pairs sweep."""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.algos.linkpred import link_scores
from tests.conftest import edges_df


def _nx_scores(g, pairs):
    """(common, jaccard, adamic_adar) per pair via networkx semantics."""
    out = {}
    jac = {(a, b): v for a, b, v in nx.jaccard_coefficient(g, pairs)}
    aa = {(a, b): v for a, b, v in nx.adamic_adar_index(g, pairs)}
    for a, b in pairs:
        cn = len(list(nx.common_neighbors(g, a, b)))
        out[(a, b)] = (cn, jac[(a, b)], aa[(a, b)])
    return out


def _collect(df):
    return {
        (r.a, r.b): (r.common, r.jaccard, r.adamic_adar) for r in df.collect()
    }


def _assert_matches(got, want):
    assert got.keys() == want.keys()
    for k, (c, j, a) in want.items():
        gc, gj, ga = got[k]
        assert gc == c, (k, gc, c)
        assert math.isclose(gj, j, rel_tol=1e-12, abs_tol=1e-12), (k, gj, j)
        assert math.isclose(ga, a, rel_tol=1e-12, abs_tol=1e-12), (k, ga, a)


def test_candidate_scoring_matches_networkx(spark):
    g = nx.gnm_random_graph(80, 240, seed=3)
    e = edges_df(spark, list(g.edges))
    # candidates: every existing edge plus a deterministic set of non-edges
    rng = np.random.default_rng(5)
    nodes = sorted(g.nodes)
    non_edges = set()
    while len(non_edges) < 60:
        a, b = (int(x) for x in rng.choice(nodes, size=2, replace=False))
        a, b = min(a, b), max(a, b)
        if not g.has_edge(a, b):
            non_edges.add((a, b))
    cand = sorted({(min(a, b), max(a, b)) for a, b in g.edges} | non_edges)
    pairs = spark.createDataFrame(cand, "a long, b long")
    got = _collect(link_scores(spark, e, pairs=pairs))
    _assert_matches(got, _nx_scores(g, cand))


def test_candidate_pairs_normalized_and_zero_kept(spark):
    # pair given reversed; pair with zero common neighbors kept at score 0
    e = edges_df(spark, [(0, 1), (1, 2), (3, 4)])
    pairs = spark.createDataFrame([(2, 0), (0, 3)], "a long, b long")
    got = _collect(link_scores(spark, e, pairs=pairs))
    assert got[(0, 2)][0] == 1  # via vertex 1
    assert got[(0, 3)] == (0, 0.0, 0.0)


def test_enumeration_matches_brute_force(spark):
    g = nx.gnm_random_graph(50, 140, seed=9)
    e = edges_df(spark, list(g.edges))
    got = _collect(link_scores(spark, e, center_cap=10_000))
    want = {}
    nodes = sorted(g.nodes)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            cn = list(nx.common_neighbors(g, a, b))
            if cn:
                uni = len(set(g[a]) | set(g[b]))
                want[(a, b)] = (
                    len(cn),
                    len(cn) / uni,
                    sum(1.0 / math.log(g.degree[c]) for c in cn),
                )
    _assert_matches(got, want)


def test_enumeration_cap_drops_hub_centers(spark):
    # hub 0 adjacent to 20 leaves; plus a triangle far away. cap=8 drops
    # the hub center, so no leaf-leaf pairs survive — only the triangle's.
    pairs = [(0, i) for i in range(1, 21)] + [(100, 101), (101, 102), (102, 100)]
    e = edges_df(spark, pairs)
    got = _collect(link_scores(spark, e, center_cap=8, log_dropped=False))
    assert set(got) == {(100, 101), (100, 102), (101, 102)}
    # triangle pair (a,b): one common neighbor c with deg 2
    for k, (c, j, a) in got.items():
        assert c == 1 and math.isclose(a, 1.0 / math.log(2.0))


def test_min_common_threshold(spark):
    # K4: every pair has exactly 2 common neighbors
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    e = edges_df(spark, k4)
    assert link_scores(spark, e, min_common=3).count() == 0
    assert link_scores(spark, e, min_common=2).count() == 6


def test_candidate_with_graphless_endpoint_kept_at_zero(spark):
    """A candidate pair naming a vertex with no edges must keep its row
    with all-zero scores (code-review regression: the degree join used to
    be inner and silently dropped it)."""
    e = edges_df(spark, [(0, 1)])
    pairs = spark.createDataFrame([(0, 5)], "a long, b long")
    got = _collect(link_scores(spark, e, pairs=pairs))
    assert got == {(0, 5): (0, 0.0, 0.0)}
