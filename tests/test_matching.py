"""maximal_matching: validity + maximality on nx adjacency, and EXACT
equality with the sequential greedy sweep over the engine's own hash
priorities — the same two-level oracle as test_mis.py."""

from __future__ import annotations

import random

import pytest

from engine.algos.matching import edge_priorities, maximal_matching


def _rand_edges(seed, n, m):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((min(a, b), max(a, b)))
    return sorted(es)


def _greedy_over(prios):
    """Sequential greedy matching in ascending (pri, lo, hi) order."""
    used, out = set(), set()
    for pri, lo, hi in sorted(prios):
        if lo not in used and hi not in used:
            used.update((lo, hi))
            out.add((lo, hi))
    return out


@pytest.mark.parametrize("seed,n,m", [(1, 30, 60), (2, 50, 200), (3, 8, 12)])
def test_valid_maximal_and_exact_greedy(spark, seed, n, m):
    edges = _rand_edges(seed, n, m)
    e = spark.createDataFrame(edges, "src long, dst long")
    res = maximal_matching(spark, e, seed=seed)
    assert res.converged
    got = {(r.lo, r.hi) for r in res.edges.collect()}
    # validity: no shared endpoint
    touched = [v for p in got for v in p]
    assert len(touched) == len(set(touched))
    # maximality: every input edge touches a matched vertex
    ts = set(touched)
    for lo, hi in edges:
        assert lo in ts or hi in ts, f"edge ({lo},{hi}) extends the matching"
    # exact greedy-order equality over the engine's own priorities
    prios = [
        (r.pri, r.lo, r.hi) for r in edge_priorities(e, seed=seed).collect()
    ]
    assert got == _greedy_over(prios)


def test_determinism_selfloops_and_directions(spark):
    edges = _rand_edges(9, 40, 120)
    e = spark.createDataFrame(edges, "src long, dst long")
    # reversed duplicate orientations + self loops must not change anything
    noisy = e.union(e.selectExpr("dst as src", "src as dst")).union(
        spark.createDataFrame([(5, 5), (7, 7)], "src long, dst long")
    )
    a = {(r.lo, r.hi) for r in maximal_matching(spark, e).edges.collect()}
    b = {
        (r.lo, r.hi)
        for r in maximal_matching(spark, noisy.repartition(13)).edges.collect()
    }
    assert a == b
    # different seed -> (almost surely) different matching, still maximal
    c = {(r.lo, r.hi) for r in maximal_matching(spark, e, seed=99).edges.collect()}
    assert c == _greedy_over(
        [(r.pri, r.lo, r.hi) for r in edge_priorities(e, seed=99).collect()]
    )


def test_edge_cases(spark):
    # empty graph
    e0 = spark.createDataFrame([], "src long, dst long")
    r0 = maximal_matching(spark, e0)
    assert r0.converged and r0.edges.count() == 0
    # single edge + isolated self-loop
    e1 = spark.createDataFrame([(1, 2), (3, 3)], "src long, dst long")
    r1 = maximal_matching(spark, e1)
    assert {(r.lo, r.hi) for r in r1.edges.collect()} == {(1, 2)}
    # star: exactly one edge matched
    star = spark.createDataFrame([(0, i) for i in range(1, 8)], "src long, dst long")
    rs = maximal_matching(spark, star)
    assert rs.edges.count() == 1
    # path a-b-c-d: greedy picks by hash, always a perfect or maximal set
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    rp = {(r.lo, r.hi) for r in maximal_matching(spark, path).edges.collect()}
    assert rp in ({(0, 1), (2, 3)}, {(1, 2)})
