"""Kahn layering vs networkx.topological_generations (exact), plus cycle
honesty: the unlayered set must equal the vertices networkx cannot peel
(those on or downstream of a directed cycle)."""

from __future__ import annotations

import networkx as nx
import pytest

from engine.algos.toposort import topological_layers
from tests.conftest import edges_df, vertices_df


def _run(spark, pairs, vids=None, **kw):
    v = vertices_df(spark, vids) if vids is not None else None
    return topological_layers(spark, edges_df(spark, pairs), vertices=v, **kw)


def _layers(res) -> dict[int, int]:
    return {r.vid: r.layer for r in res.layers.collect()}


def _nx_generations(g) -> dict[int, int]:
    return {
        v: k for k, gen in enumerate(nx.topological_generations(g)) for v in gen
    }


def test_random_dag_matches_topological_generations(spark):
    # DAG by construction: edges only from lower to higher vid.
    g = nx.gnm_random_graph(60, 180, seed=13, directed=True)
    dag = nx.DiGraph((u, v) for u, v in g.edges if u < v)
    dag.add_nodes_from(g)
    res = _run(spark, list(dag.edges), vids=sorted(dag))
    assert res.is_dag
    assert res.unlayered.count() == 0
    want = _nx_generations(dag)
    assert _layers(res) == want
    assert res.depth == max(want.values()) + 1


def test_diamond_and_isolated(spark):
    # 0->1, 0->2, 1->3, 2->3 plus isolated 9: layers 0/1/1/2 and 9 at 0.
    res = _run(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], vids=[0, 1, 2, 3, 9])
    assert res.is_dag
    assert _layers(res) == {0: 0, 1: 1, 2: 1, 3: 2, 9: 0}
    assert res.depth == 3


def test_longest_path_semantics(spark):
    # 0->3 shortcut does not pull 3 earlier: layer = LONGEST path depth.
    res = _run(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    assert _layers(res)[3] == 3


def test_cycle_honesty_and_require_dag(spark):
    # 0->1->2 feeding cycle 3<->4 feeding 5: {3,4,5} unlayered.
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 3), (4, 5)]
    res = _run(spark, pairs)
    assert not res.is_dag
    assert _layers(res) == {0: 0, 1: 1, 2: 2}
    assert {r.vid for r in res.unlayered.collect()} == {3, 4, 5}
    with pytest.raises(ValueError, match="not a DAG"):
        _run(spark, pairs, require_dag=True)


def test_self_loop_is_a_cycle(spark):
    res = _run(spark, [(0, 1), (1, 1)])
    assert not res.is_dag
    assert _layers(res) == {0: 0}
    assert {r.vid for r in res.unlayered.collect()} == {1}


def test_parallel_edges_do_not_inflate_degree(spark):
    # duplicate (0,1) rows must still peel 1 in layer 1
    res = _run(spark, [(0, 1), (0, 1), (1, 2)])
    assert res.is_dag
    assert _layers(res) == {0: 0, 1: 1, 2: 2}


def test_depth_cap_raises_loudly(spark):
    pairs = [(i, i + 1) for i in range(6)]
    with pytest.raises(ValueError, match="max_depth"):
        _run(spark, pairs, max_depth=3)
