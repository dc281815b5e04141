"""WL structural hashing: isomorphism invariance (random relabelings hash
equal), agreement with networkx's WL-hash EQUALITY PATTERN across a graph
family, the documented 1-WL blind spot (C6 vs 2xC3 collide — in nx too),
structural roles on a path, batched multi-graph == per-graph, directed
sink handling, determinism."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from engine.algos.wlhash import wl_graph_hash, wl_labels
from tests.conftest import edges_df


def _gid_edges(spark, graphs):
    """{gid: [(u, v)]} -> one batched edge DataFrame."""
    rows = [(g, int(u), int(v)) for g, es in graphs.items() for u, v in es]
    return spark.createDataFrame(rows, "gid long, src long, dst long")


def _hash_one(spark, pairs, rounds=3, **kw):
    r = wl_graph_hash(spark, edges_df(spark, pairs), rounds=rounds, **kw)
    row = r.collect()[0]
    r.unpersist()
    return int(row.wl_hash)


def test_isomorphism_invariance_random_relabel(spark):
    g = nx.gnm_random_graph(20, 45, seed=3)
    base = _hash_one(spark, list(g.edges()))
    rng = random.Random(9)
    for _ in range(3):
        perm = list(g.nodes())
        rng.shuffle(perm)
        m = dict(zip(g.nodes(), perm))
        relab = [(m[u], m[v]) for u, v in g.edges()]
        assert _hash_one(spark, relab) == base


def test_equality_pattern_matches_networkx(spark):
    # our hashes and nx's WL hashes must induce the SAME partition of a
    # graph family into equivalence classes (values differ by design)
    family = {
        0: nx.path_graph(6),
        1: nx.path_graph(6),  # isomorphic to 0
        2: nx.cycle_graph(6),
        3: nx.star_graph(5),
        4: nx.gnm_random_graph(8, 14, seed=1),
        5: nx.gnm_random_graph(8, 14, seed=2),
    }
    ours = {
        g: _hash_one(spark, list(G.edges()), rounds=3)
        for g, G in family.items()
    }
    theirs = {
        g: nx.weisfeiler_lehman_graph_hash(G, iterations=3)
        for g, G in family.items()
    }
    for a in family:
        for b in family:
            assert (ours[a] == ours[b]) == (theirs[a] == theirs[b]), (a, b)


def test_1wl_blind_spot_c6_vs_2c3(spark):
    c6 = list(nx.cycle_graph(6).edges())
    two_c3 = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    # every vertex is degree-2 with degree-2 neighbors forever: 1-WL
    # cannot separate these — and neither can networkx's WL hash
    assert _hash_one(spark, c6) == _hash_one(spark, two_c3)
    assert nx.weisfeiler_lehman_graph_hash(
        nx.cycle_graph(6), iterations=3
    ) == nx.weisfeiler_lehman_graph_hash(
        nx.Graph(two_c3), iterations=3
    )


def test_structural_roles_on_path(spark):
    # P5 after 2 rounds: ends {0,4}, their neighbors {1,3}, center {2}
    labels = wl_labels(spark, edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]), rounds=2)
    lab = {r.vid: r.wl_label for r in labels.collect()}
    labels.unpersist()
    assert lab[0] == lab[4] and lab[1] == lab[3]
    assert len({lab[0], lab[1], lab[2]}) == 3


def test_batched_multigraph_equals_singletons(spark):
    graphs = {
        7: list(nx.path_graph(5).edges()),
        8: list(nx.cycle_graph(5).edges()),
        9: list(nx.star_graph(4).edges()),
    }
    batched = wl_graph_hash(
        spark, _gid_edges(spark, graphs), rounds=3, gid_col="gid"
    )
    got = {int(r.gid): int(r.wl_hash) for r in batched.collect()}
    batched.unpersist()
    for g, es in graphs.items():
        assert got[g] == _hash_one(spark, es, rounds=3)


def test_directed_sinks_carry_labels(spark):
    # a -> b -> c: c is a pure sink; in directed mode it must still be
    # labeled (degree 0) and distinguish b's multiset from a's
    labels = wl_labels(
        spark, edges_df(spark, [(0, 1), (1, 2)]), rounds=2, directed=True
    )
    lab = {r.vid: r.wl_label for r in labels.collect()}
    labels.unpersist()
    assert set(lab) == {0, 1, 2}
    assert len({lab[0], lab[1], lab[2]}) == 3


def test_rounds_zero_is_degree_partition_and_validation(spark):
    labels = wl_labels(spark, edges_df(spark, [(0, 1), (1, 2)]), rounds=0)
    lab = {r.vid: r.wl_label for r in labels.collect()}
    labels.unpersist()
    assert lab[0] == lab[2] != lab[1]
    with pytest.raises(ValueError, match="rounds"):
        wl_labels(spark, edges_df(spark, [(0, 1)]), rounds=-1)
