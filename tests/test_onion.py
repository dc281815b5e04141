"""Onion decomposition (engine/algos/onion.py) vs networkx.onion_layers
(whole-dict exact) and networkx.core_number (the ratcheted core at peel
time IS the core number)."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.onion import onion_layers
from tests.conftest import edges_df


def _run(spark, g, vertices=None, **kw):
    res = onion_layers(spark, edges_df(spark, list(g.edges)),
                       vertices=vertices, **kw)
    got_layer = {r.vid: r.layer for r in res.layers.collect()}
    got_core = {r.vid: r.core for r in res.layers.collect()}
    return res, got_layer, got_core


@pytest.mark.parametrize(
    "g",
    [
        nx.gnm_random_graph(40, 110, seed=3),
        nx.gnm_random_graph(60, 90, seed=17),   # sparse: long periphery
        nx.barbell_graph(6, 3),
        nx.karate_club_graph(),
        nx.path_graph(15),                      # adversarial: many layers
        nx.complete_graph(7),                   # one layer, core 6
    ],
)
def test_matches_networkx(spark, g):
    g = nx.Graph(g)
    g.remove_nodes_from(list(nx.isolates(g)))
    res, got_layer, got_core = _run(spark, g)
    assert res.converged
    assert got_layer == nx.onion_layers(g)
    assert got_core == nx.core_number(g)


def test_isolated_vertices_layer1_core0(spark):
    # nx docstring graph: havel_hakimi of [0,1,2,2,2,2,3] has an isolated
    # vertex -> layer 1, everything else shifts to layer 2+
    g = nx.havel_hakimi_graph([0, 1, 2, 2, 2, 2, 3])
    vs = spark.createDataFrame([(v,) for v in g], "vid long")
    res, got_layer, got_core = _run(spark, g, vertices=vs)
    assert got_layer == nx.onion_layers(g)
    assert got_core == nx.core_number(g)
    assert res.converged

    # without the vertices table, edge-less vertices are invisible and
    # the peeling still numbers from 1 (nx on the de-isolated graph)
    g2 = nx.Graph(g)
    g2.remove_nodes_from(list(nx.isolates(g2)))
    _, got2, _ = _run(spark, g)
    assert got2 == nx.onion_layers(g2)


def test_self_loops_dropped_like_simple_view(spark):
    # nx raises on self loops; the engine's simple view drops them — the
    # oracle is nx on the de-looped graph
    pairs = [(0, 1), (1, 2), (2, 0), (2, 2), (2, 3)]
    res = onion_layers(spark, edges_df(spark, pairs))
    got = {r.vid: r.layer for r in res.layers.collect()}
    g = nx.Graph([(0, 1), (1, 2), (2, 0), (2, 3)])
    assert got == nx.onion_layers(g)


def test_truncation_is_loud_prefix(spark):
    g = nx.path_graph(12)  # needs several rounds
    full = onion_layers(spark, edges_df(spark, list(g.edges)))
    assert full.converged and full.rounds > 2
    trunc = onion_layers(spark, edges_df(spark, list(g.edges)), max_rounds=2)
    assert not trunc.converged and trunc.rounds == 2
    got = {r.vid: r.layer for r in trunc.layers.collect()}
    want = {k: v for k, v in nx.onion_layers(g).items() if v <= 2}
    assert got == want  # exactly the first two layers, nothing invented


def test_partitioning_invariance_and_fold_boundary(spark):
    # path_graph(40) peels ~20 layers — crosses the FOLD_EVERY=16 result
    # fold; layers must be identical to nx and to a repartitioned run
    g = nx.path_graph(40)
    e = edges_df(spark, list(g.edges))
    a = onion_layers(spark, e)
    b = onion_layers(spark, e.repartition(7))
    da = {(r.vid, r.layer, r.core) for r in a.layers.collect()}
    db = {(r.vid, r.layer, r.core) for r in b.layers.collect()}
    assert da == db
    assert {v: l for v, l, _ in da} == nx.onion_layers(g)
    assert a.rounds > 16  # the fold boundary was actually exercised


def test_validation(spark):
    with pytest.raises(ValueError, match="max_rounds"):
        onion_layers(spark, edges_df(spark, [(0, 1)]), max_rounds=0)
