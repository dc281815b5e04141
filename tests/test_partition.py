"""Spinner-style balanced k-way partitioning: validity (total, in-range),
degree-weighted balance under the capacity bound, cut improvement over the
hash init on community-structured graphs, perfect split on two cliques +
bridge, bit-determinism, parameter validation."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from engine.algos.partition import edge_cut, partition_graph
from tests.conftest import edges_df


def _clique_pair(n=12):
    """Two n-cliques joined by one bridge edge: ideal 2-cut == 1."""
    pairs = []
    for a in range(n):
        for b in range(a + 1, n):
            pairs.append((a, b))
            pairs.append((100 + a, 100 + b))
    pairs.append((0, 100))
    return pairs


def _hash_cut(spark, df, k):
    """Cut of the initial assignment (hash mod k) — the baseline."""
    asg = (
        df.select(F.col("src").alias("vid"))
        .union(df.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.pmod(F.xxhash64("vid"), F.lit(k)).cast("int").alias("part"))
    )
    return edge_cut(df, asg)


def test_two_cliques_perfect_split(spark):
    pairs = _clique_pair(12)
    df = edges_df(spark, pairs)
    res = partition_graph(spark, df, k=2, max_rounds=20)
    asg = {r.vid: r.part for r in res.assignment.collect()}
    # every vertex labeled, labels in range
    assert set(asg) == {v for p in pairs for v in p[:2]}
    assert set(asg.values()) <= {0, 1}
    # each clique ends up monochromatic and the cliques differ
    left = {asg[v] for v in range(12)}
    right = {asg[100 + v] for v in range(12)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert res.cut_history[-1] == 1
    res.assignment.unpersist()


def test_balance_and_cut_improvement_random_communities(spark):
    # planted partition: 4 communities of 25, dense inside, sparse across
    g = nx.planted_partition_graph(4, 25, 0.4, 0.01, seed=11)
    pairs = [(u, v) for u, v in g.edges()]
    df = edges_df(spark, pairs)
    k = 4
    res = partition_graph(spark, df, k=k, slack=0.1, max_rounds=20)
    # balance: every partition's degree-weighted load within capacity
    assert res.capacity == pytest.approx((1.1) * 2 * len(pairs) / k)
    for p, load in res.loads.items():
        assert 0 <= p < k
        assert load <= res.capacity + 1e-9
    # locality: final cut strictly better than the hash baseline
    base = _hash_cut(spark, df, k)
    final = res.cut_history[-1]
    assert final < base
    assert final == edge_cut(df, res.assignment)  # history is honest
    res.assignment.unpersist()


def test_reported_loads_match_assignment(spark):
    # partition loads now ride the labels materialization as an
    # Observation (k scalar sums); ground-truth them against a direct
    # degree aggregation over the returned assignment. Unweighted degrees
    # are small integers, so the double sums are exact in any order.
    g = nx.gnm_random_graph(80, 320, seed=12)
    df = edges_df(spark, list(g.edges))
    res = partition_graph(spark, df, k=4, max_rounds=4, track_cut=False)
    und = df.select("src", "dst").filter(F.col("src") != F.col("dst"))
    deg_rows = (
        und.select(F.col("src").alias("vid"))
        .unionByName(und.select(F.col("dst").alias("vid")))
        .groupBy("vid").count().collect()
    )
    deg = {r.vid: float(r["count"]) for r in deg_rows}
    asg = {r.vid: r.part for r in res.assignment.collect()}
    expect: dict[int, float] = {}
    for vid, part in asg.items():
        expect[part] = expect.get(part, 0.0) + deg.get(vid, 0.0)
    got = {p: l for p, l in res.loads.items() if l != 0.0}
    assert got == expect
    res.assignment.unpersist()


def test_deterministic_reruns(spark):
    g = nx.gnm_random_graph(60, 240, seed=7)
    df = edges_df(spark, list(g.edges()))
    r1 = partition_graph(spark, df, k=3, max_rounds=8)
    r2 = partition_graph(spark, df, k=3, max_rounds=8)
    a1 = sorted((r.vid, r.part) for r in r1.assignment.collect())
    a2 = sorted((r.vid, r.part) for r in r2.assignment.collect())
    assert a1 == a2
    assert r1.cut_history == r2.cut_history
    r1.assignment.unpersist()
    r2.assignment.unpersist()


def test_track_cut_off_still_reports_final(spark):
    pairs = _clique_pair(8)
    df = edges_df(spark, pairs)
    res = partition_graph(spark, df, k=2, max_rounds=10, track_cut=False)
    assert len(res.cut_history) == 1
    assert res.cut_history[-1] == edge_cut(df, res.assignment)
    res.assignment.unpersist()


def test_rejects_bad_k_and_empty(spark):
    df = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError, match="k must be"):
        partition_graph(spark, df, k=1)
    loops = edges_df(spark, [(3, 3), (4, 4)])
    with pytest.raises(ValueError, match="no non-loop"):
        partition_graph(spark, loops, k=2)


def test_round1_convergence_still_reports_final_cut(spark):
    # a graph whose hash init is already the fixpoint: cut_history[-1]
    # must exist (code-review r4: round-1 convergence broke the promise)
    df = edges_df(spark, [(0, 1)])
    res = partition_graph(spark, df, k=2, max_rounds=5)
    assert res.cut_history, "final cut must always be measured"
    assert res.cut_history[-1] == edge_cut(df, res.assignment)
    res.assignment.unpersist()


def test_weighted_capacity_and_cut(spark):
    # heavy edge pair must dominate the degree mass and the cut metric
    pairs = [(0, 1, 10.0), (2, 3, 10.0), (0, 2, 1.0), (1, 3, 1.0)]
    df = edges_df(spark, pairs)
    res = partition_graph(spark, df, k=2, weight_col="weight", slack=0.3)
    # capacity uses the weighted total degree (2 * 22 mass)
    assert res.capacity == pytest.approx(1.3 * 2 * 22.0 / 2)
    asg = {r.vid: r.part for r in res.assignment.collect()}
    # optimum splits the two heavy pairs apart (cut = the two light edges)
    assert asg[0] == asg[1] and asg[2] == asg[3] and asg[0] != asg[2]
    assert res.cut_history[-1] == pytest.approx(2.0)
    res.assignment.unpersist()


def test_warm_start_fixpoint_and_validation(spark):
    pairs = _clique_pair(8)
    df = edges_df(spark, pairs)
    perfect = spark.createDataFrame(
        [(v, 0) for v in range(8)] + [(100 + v, 1) for v in range(8)],
        "vid long, part int",
    )
    res = partition_graph(spark, df, k=2, initial_assignment=perfect)
    assert res.converged and res.rounds == 1  # nothing wants to move
    assert res.cut_history[-1] == 1
    res.assignment.unpersist()
    bad = spark.createDataFrame([(0, 7)], "vid long, part int")
    with pytest.raises(ValueError, match="outside"):
        partition_graph(spark, df, k=2, initial_assignment=bad)


def test_multilevel_quality_and_balance(spark):
    import networkx as nx

    from engine.algos.partition import partition_graph_multilevel

    g = nx.planted_partition_graph(4, 25, 0.4, 0.01, seed=31)
    df = edges_df(spark, list(g.edges()))
    res = partition_graph_multilevel(spark, df, k=4, levels=2, slack=0.1)
    for load in res.loads.values():
        assert load <= res.capacity + 1e-9
    base = _hash_cut(spark, df, 4)
    assert res.cut_history[-1] < base
    assert res.cut_history[-1] == edge_cut(df, res.assignment)
    res.assignment.unpersist()
