"""Degree-preserving rewiring (engine/algos/rewire.py).

The oracle is the STRUCTURAL invariant set, checked after every round
count: exact degree multiset, simple graph (no self loops, no duplicate
edges), edge count preserved, bit-determinism under repartitioning —
plus mixing evidence (clustering collapses on a clustered graph) and the
Colizza-normalized rich club built on top."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from engine.algos.rewire import double_edge_swap, rich_club_normalized
from tests.conftest import edges_df


def _degrees(df):
    und = df.select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b")).distinct()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v").count().collect()
    )
    return sorted((r["v"], r["count"]) for r in deg)


def _edge_set(df):
    return {(r.src, r.dst) for r in df.collect()}


@pytest.mark.parametrize("g,rounds", [
    (nx.gnm_random_graph(50, 160, seed=8), 5),
    (nx.barbell_graph(8, 2), 8),
    (nx.karate_club_graph(), 6),
])
def test_invariants_hold_every_time(spark, g, rounds):
    e = edges_df(spark, list(g.edges))
    before_deg = _degrees(e)
    res = double_edge_swap(spark, e, rounds=rounds)
    out = _edge_set(res.edges)
    # simple graph: canonical a<b, no duplicates, no self loops
    assert all(a < b for a, b in out)
    assert len(out) == g.number_of_edges()
    assert _degrees(res.edges) == before_deg   # EXACT degree multiset
    assert res.swaps_attempted >= res.swaps_applied >= 0


def test_actually_rewires_and_mixes(spark):
    # two dense cliques + bridge: heavy clustering that a degree-
    # preserving null model must destroy
    g = nx.barbell_graph(9, 0)
    e = edges_df(spark, list(g.edges))
    res = double_edge_swap(spark, e, rounds=10)
    assert res.swaps_applied > 0
    before = _edge_set(e.select(F.least("src", "dst").alias("src"),
                                F.greatest("src", "dst").alias("dst")))
    after = _edge_set(res.edges)
    assert after != before                      # something moved
    g2 = nx.Graph(list(after))
    assert nx.transitivity(g2) < nx.transitivity(g)  # clustering collapsed
    # same degree sequence implies same vertex set and edge count
    assert sorted(dict(g2.degree).values()) == sorted(dict(g.degree).values())


def test_swap_tallies_match_edge_diff(spark):
    # the applied/attempted tallies now ride the state materialization as
    # an Observation; ground-truth them against the edge-set diff: every
    # committed pair removes its 2 originals and adds 2 new edges that are
    # provably disjoint from the input set (a candidate colliding with ANY
    # input edge reverts), so after one round |after \ before| == 2*applied.
    g = nx.gnm_random_graph(60, 180, seed=3)
    e = edges_df(spark, list(g.edges))
    before = _edge_set(e.select(F.least("src", "dst").alias("src"),
                                F.greatest("src", "dst").alias("dst")))
    res = double_edge_swap(spark, e, rounds=1, seed=11)
    after = _edge_set(res.edges)
    assert len(after - before) == 2 * res.swaps_applied
    assert len(before - after) == 2 * res.swaps_applied
    assert res.swaps_attempted >= res.swaps_applied


def test_bit_determinism_and_seed_sensitivity(spark):
    g = nx.gnm_random_graph(40, 120, seed=5)
    e = edges_df(spark, list(g.edges))
    a = _edge_set(double_edge_swap(spark, e, rounds=4, seed=7).edges)
    b = _edge_set(double_edge_swap(spark, e.repartition(13), rounds=4, seed=7).edges)
    c = _edge_set(double_edge_swap(spark, e, rounds=4, seed=8).edges)
    assert a == b                                # partitioning-invariant
    assert a != c                                # seed actually matters


def test_multigraph_input_collapses_first(spark):
    # duplicate orientations + self loop are removed by the simple view
    pairs = [(0, 1), (1, 0), (2, 2), (1, 2), (2, 3), (3, 0)]
    res = double_edge_swap(spark, edges_df(spark, pairs), rounds=3)
    out = _edge_set(res.edges)
    assert len(out) == 4 and all(a < b for a, b in out)


def test_validation(spark):
    with pytest.raises(ValueError, match="rounds"):
        double_edge_swap(spark, edges_df(spark, [(0, 1)]), rounds=0)


def test_rich_club_normalized(spark):
    # ring of cliques: hubs (clique members) interlink far beyond their
    # degree's forcing -> phi_norm > 1 somewhere; and the k range matches
    # the unnormalized table row-for-row (degree sequence is shared)
    g = nx.ring_of_cliques(6, 5)
    e = edges_df(spark, list(g.edges))
    from engine.graph import rich_club

    plain = {r.k: r.phi for r in rich_club(e).collect()}
    rows = rich_club_normalized(spark, e, rounds=8).collect()
    got = {r.k: r for r in rows}
    assert set(got) == set(plain)
    for k, r in got.items():
        assert r.phi == plain[k]
        if r.phi_null and r.phi_null > 0:
            assert r.phi_norm == pytest.approx(r.phi / r.phi_null)
        else:
            assert r.phi_norm is None


def test_motif_zscore_triangles(spark):
    from engine.algos.rewire import motif_zscore
    from engine.algos.triangles import triangle_count

    stat = lambda e: triangle_count(spark, e)
    # ring of cliques: triangle count far above its configuration model
    g = nx.ring_of_cliques(6, 5)
    res = motif_zscore(spark, edges_df(spark, list(g.edges)), stat,
                       replicas=3, rounds=6)
    assert res.observed == 6 * 10          # 6 cliques x C(5,3)
    assert res.zscore is not None and res.zscore > 2.0
    assert res.null_mean < res.observed
    assert len(res.null_values) == 3

    # edge count is a function of the degree sequence alone: the null
    # cannot vary, and the honest answer is zscore=None, not a blowup
    res2 = motif_zscore(
        spark, edges_df(spark, list(g.edges)),
        lambda e: e.count(), replicas=2, rounds=2,
    )
    assert res2.null_std == 0.0 and res2.zscore is None

    import pytest as _pt
    with _pt.raises(ValueError, match="replicas"):
        motif_zscore(spark, edges_df(spark, [(0, 1)]), stat, replicas=1)
