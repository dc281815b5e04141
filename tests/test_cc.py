"""t1/t2: connected components — hand graphs, corpus graph, random sweep."""

import random

import pytest

from engine.algos.cc import connected_components
from tests.conftest import edges_df, vertices_df
from tests.oracles import cc_oracle, nx_digraph

HAND = {
    "empty": ([0, 1, 2], []),
    "self_loop": ([0, 1], [(0, 0), (0, 1)]),
    "duplicates": ([0, 1, 2], [(0, 1), (0, 1), (1, 0)]),
    "two_components": (list(range(6)), [(0, 1), (1, 2), (3, 4)]),
    "star": (list(range(8)), [(0, i) for i in range(1, 8)]),
    "chain": (list(range(10)), [(i, i + 1) for i in range(9)]),
}


def _check(spark, vids, pairs):
    v = vertices_df(spark, vids)
    e = edges_df(spark, pairs)
    res = connected_components(spark, e, v)
    ours = {r.vid: r.label for r in res.labels.collect()}
    ref = cc_oracle(nx_digraph(vids, [(a, b, 1.0) for a, b in pairs]))
    assert ours == ref


@pytest.mark.parametrize("name", sorted(HAND))
def test_hand_graphs(spark, name):
    _check(spark, *HAND[name])


def test_corpus_graph_exact(spark, tiny_graph, tiny_nx):
    v, e = tiny_graph
    res = connected_components(spark, e, v)
    ours = {r.vid: r.label for r in res.labels.collect()}
    assert ours == cc_oracle(tiny_nx)
    assert res.rounds < 10  # large-star/small-star converges in O(log^2 n)


def test_random_graphs_exact(spark):
    """t4-style sweep: seeded random graphs in one test (keeps the Spark
    job count bounded — hypothesis-per-example would pay the ~0.4 s/job
    floor hundreds of times)."""
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(5, 40)
        m = rng.randint(0, n * 2)
        vids = list(range(n))
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        _check(spark, vids, pairs)
