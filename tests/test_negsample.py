"""Negative edge sampling: no real-edge collisions, exact per-positive
quota, within-positive distinctness, bit-determinism under partitioning,
degree-weighted vs uniform shape, saturated-vertex loud failure."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from engine.algos.negsample import sample_negative_edges
from tests.conftest import edges_df


def _graph_df(spark, seed=3, n=30, m=80):
    g = nx.gnm_random_graph(n, m, seed=seed, directed=True)
    return edges_df(spark, list(g.edges())), g


def test_quota_collisions_distinctness(spark):
    df, g = _graph_df(spark)
    neg = sample_negative_edges(spark, df, n_per_pos=3)
    rows = neg.collect()
    neg.unpersist()
    real = set(g.edges())
    # quota: exactly 3 per positive edge, ids 0..2
    per_pos = {}
    for r in rows:
        per_pos.setdefault((r.src, r.pos_dst), []).append((r.neg_id, r.dst))
    assert set(per_pos) == real
    for (s, _), draws in per_pos.items():
        assert sorted(i for i, _ in draws) == [0, 1, 2]
        dsts = [d for _, d in draws]
        assert len(set(dsts)) == 3  # within-positive distinct
        for d in dsts:
            assert (s, d) not in real  # never a real edge


def test_deterministic_under_partitioning(spark):
    df, _ = _graph_df(spark, seed=9)
    a = sample_negative_edges(spark, df, n_per_pos=2)
    b = sample_negative_edges(spark, df.repartition(11), n_per_pos=2)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    a.unpersist()
    b.unpersist()
    assert ra == rb


def test_power_shapes_distribution(spark):
    # star-ish graph: one hub destination with huge in-degree; power=1
    # draws it far more often than power=0 (uniform over destinations).
    # Only HALF the sources link to the hub — for the rest the hub is a
    # legal corruption (a source that already links to it can never draw
    # it, collisions reject).
    pairs = [(i, 99) for i in range(20)] + [(i, i + 200) for i in range(40)]
    df = edges_df(spark, pairs)

    def hub_fraction(power):
        # hub draws collide with the real (i, 99) edge ~half the time at
        # power=1, so the rejection loop genuinely needs extra rounds here
        neg = sample_negative_edges(
            spark, df, n_per_pos=4, power=power, max_rounds=24
        )
        n_hub = neg.filter(F.col("dst") == 99).count()
        total = neg.count()
        neg.unpersist()
        return n_hub / total

    assert hub_fraction(1.0) > 2 * hub_fraction(0.0)


def test_saturated_vertex_fails_loudly(spark):
    # vertex 0 connects to EVERY destination: its positives can never
    # find a non-colliding corruption
    pairs = [(0, d) for d in range(1, 5)]
    df = edges_df(spark, pairs)
    with pytest.raises(RuntimeError, match="unfilled"):
        sample_negative_edges(spark, df, n_per_pos=4, max_rounds=3)
    with pytest.raises(ValueError, match="n_per_pos"):
        sample_negative_edges(spark, df, n_per_pos=0)
