"""smooth_features vs an exact pure-python oracle of the documented rule."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from engine.algos.featprop import smooth_features


def _py_smooth(edges, feats, rounds, agg="mean", direction="in", sw=0.5):
    h = {v: list(x) for v, x in feats.items()}
    if direction == "in":
        es = list(edges)
    elif direction == "out":
        es = [(d, s) for s, d in edges]
    else:
        es = list(edges) + [(d, s) for s, d in edges]
    for _ in range(rounds):
        nbr_sum, nbr_n = {}, {}
        for s, d in es:
            if s in h and d in h:
                acc = nbr_sum.setdefault(d, [0.0] * len(h[s]))
                for i, v in enumerate(h[s]):
                    acc[i] += v
                nbr_n[d] = nbr_n.get(d, 0) + 1
        nh = {}
        for v, x in h.items():
            if v not in nbr_n:
                nh[v] = list(x)
            else:
                m = nbr_sum[v]
                if agg == "mean":
                    m = [s / nbr_n[v] for s in m]
                nh[v] = [sw * a + (1 - sw) * b for a, b in zip(x, m)]
        h = nh
    return h


def _graph(seed=7, n=40, m=120, d=3):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        s, t = rng.randrange(n), rng.randrange(n)
        if s != t:
            edges.add((s, t))
    feats = {v: [rng.uniform(-1, 1) for _ in range(d)] for v in range(n)}
    return sorted(edges), feats


@pytest.mark.parametrize(
    "rounds,agg,direction,sw",
    [
        (1, "mean", "in", 0.5),
        (3, "mean", "in", 0.5),
        (2, "mean", "out", 0.3),
        (2, "mean", "both", 0.5),
        (2, "sum", "in", 0.0),
        (1, "mean", "in", 1.0),  # pure self: fixpoint
    ],
)
def test_matches_oracle(spark, rounds, agg, direction, sw):
    edges, feats = _graph()
    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame(
        [(v, x) for v, x in feats.items()], "vid long, x array<double>"
    )
    got = {
        r.vid: list(r.x)
        for r in smooth_features(
            spark, e, f, rounds=rounds, agg=agg, direction=direction,
            self_weight=sw,
        ).collect()
    }
    want = _py_smooth(edges, feats, rounds, agg, direction, sw)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-12), f"v={v}"


def test_isolated_vertex_and_missing_neighbor(spark):
    # 2 -> 0 exists but 2 has no feature row: 0 must stay FIXED (its only
    # in-neighbor contributes nothing), and 2 must be absent from output.
    e = spark.createDataFrame([(2, 0), (0, 1)], "src long, dst long")
    f = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (9, [5.0, 6.0])],
        "vid long, x array<double>",
    )
    got = {
        r.vid: list(r.x)
        for r in smooth_features(spark, e, f, rounds=1).collect()
    }
    assert got[0] == [1.0, 2.0]  # in-neighbor 2 is featureless
    assert got[1] == [0.5 * 3.0 + 0.5 * 1.0, 0.5 * 4.0 + 0.5 * 2.0]
    assert got[9] == [5.0, 6.0]  # isolated: kept verbatim


def test_partitioning_invariance_and_contracts(spark):
    edges, feats = _graph(seed=11)
    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame(
        [(v, x) for v, x in feats.items()], "vid long, x array<double>"
    )
    a = {
        r.vid: list(r.x)
        for r in smooth_features(spark, e, f, rounds=2).collect()
    }
    b = {
        r.vid: list(r.x)
        for r in smooth_features(
            spark, e.repartition(13), f.repartition(3), rounds=2
        ).collect()
    }
    for v in a:
        assert a[v] == pytest.approx(b[v], rel=1e-12)
    with pytest.raises(ValueError, match="rounds"):
        smooth_features(spark, e, f, rounds=0)
    with pytest.raises(ValueError, match="agg"):
        smooth_features(spark, e, f, agg="max")
    with pytest.raises(ValueError, match="direction"):
        smooth_features(spark, e, f, direction="sideways")
    with pytest.raises(ValueError, match="self_weight"):
        smooth_features(spark, e, f, self_weight=1.5)
    with pytest.raises(ValueError, match="empty feature"):
        smooth_features(spark, e, f.filter(F.col("vid") < 0))
