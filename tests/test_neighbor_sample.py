"""Layered neighbor sampling — structural guarantees (real edges, exact
per-group caps, full coverage when fanout >= degree), per-seed
independence, and bit-determinism under repartitioning."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.neighbor_sample import khop_sample, sample_neighbors
from tests.conftest import edges_df, vertices_df


@pytest.fixture(scope="module")
def g():
    g = nx.gnm_random_graph(30, 180, seed=11, directed=True)
    g.remove_nodes_from([v for v in list(g.nodes) if g.degree(v) == 0])
    return g


@pytest.fixture(scope="module")
def e_df(spark, g):
    df = edges_df(spark, list(g.edges)).cache()
    df.count()
    return df


def test_sample_neighbors_caps_and_uniform_keys(spark, g, e_df):
    out = sample_neighbors(e_df, 3)
    rows = [(r.src, r.dst) for r in out.collect()]
    assert set(rows) <= set(g.edges)
    from collections import Counter

    per_src = Counter(s for s, _ in rows)
    for v in g.nodes:
        d = g.out_degree(v)
        if d:
            assert per_src[v] == min(3, d), v
    # determinism under repartitioning
    again = sample_neighbors(e_df.repartition(7), 3)
    assert sorted(rows) == sorted((r.src, r.dst) for r in again.collect())
    # a different salt draws a different sample somewhere
    other = sample_neighbors(e_df, 3, salt="other")
    assert sorted(rows) != sorted((r.src, r.dst) for r in other.collect())


def test_khop_structure(spark, g, e_df):
    seeds = sorted(g.nodes)[:4]
    out = khop_sample(
        spark, e_df, vertices_df(spark, seeds).select("vid"), fanouts=[3, 2]
    ).collect()
    assert {r.hop for r in out} == {1, 2}
    assert set((r.src, r.dst) for r in out) <= set(g.edges)
    for s in seeds:
        mine = [r for r in out if r.seed == s]
        h1 = [r for r in mine if r.hop == 1]
        # hop 1 expands exactly the seed
        assert {r.src for r in h1} == {s}
        assert len(h1) == min(3, g.out_degree(s))
        # hop 2 sources are exactly distinct hop-1 destinations (that
        # have out-edges), each capped at 2
        h2_by_src = {}
        for r in mine:
            if r.hop == 2:
                h2_by_src.setdefault(r.src, []).append(r.dst)
        expect_srcs = {d for r in h1 for d in [r.dst] if g.out_degree(d) > 0}
        assert set(h2_by_src) == expect_srcs
        for v, dsts in h2_by_src.items():
            assert len(dsts) == len(set(dsts)) == min(2, g.out_degree(v))


def test_khop_full_coverage_when_fanout_dominates(spark, g, e_df):
    """fanout >= max degree -> hop 1 IS the exact out-neighborhood."""
    seeds = sorted(g.nodes)[:5]
    big = 1 + max(g.out_degree(v) for v in g.nodes)
    out = khop_sample(
        spark, e_df, vertices_df(spark, seeds).select("vid"),
        fanouts=[big], pool_cap=4 * big,
    ).collect()
    for s in seeds:
        got = {r.dst for r in out if r.seed == s}
        assert got == set(g.successors(s)), s


def test_khop_determinism_and_seed_independence(spark, g, e_df):
    seeds = vertices_df(spark, sorted(g.nodes)[:6]).select("vid")
    a = khop_sample(spark, e_df, seeds, fanouts=[2, 2]).collect()
    b = khop_sample(spark, e_df.repartition(13), seeds, fanouts=[2, 2]).collect()
    key = lambda r: (r.seed, r.hop, r.src, r.dst)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    # two seeds expanding the SAME vertex may draw different neighbors
    # (per-seed hash) — assert the mechanism exists somewhere in the run
    by_sv = {}
    for r in a:
        by_sv.setdefault((r.hop, r.src), set()).add((r.seed, r.dst))
    diverse = any(
        len({d for _, d in picks}) > 1 and len({s for s, _ in picks}) > 1
        for picks in by_sv.values()
    )
    assert diverse


def test_validation(spark, e_df):
    seeds = vertices_df(spark, [0]).select("vid")
    with pytest.raises(ValueError, match="fanout"):
        sample_neighbors(e_df, 0)
    with pytest.raises(ValueError, match="fanouts"):
        khop_sample(spark, e_df, seeds, fanouts=[])
    with pytest.raises(ValueError, match="pool_cap"):
        khop_sample(spark, e_df, seeds, fanouts=[8], pool_cap=4)
