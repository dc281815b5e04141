"""Locality edge store (Spinner assignment -> partitionBy directories):
round-trip fidelity, part=-1 for unassigned vertices, directory pruning
plan-asserted AND file-level behavioral check, locality win vs hash
layout on a community graph."""

from __future__ import annotations

import networkx as nx
from pyspark.sql import functions as F

from engine.algos.partition import partition_graph
from engine.graph import load_edges_locality, save_edges_locality
from tests.conftest import edges_df


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _community_edges(spark):
    g = nx.planted_partition_graph(4, 20, 0.5, 0.01, seed=23)
    return edges_df(spark, list(g.edges()))


def test_roundtrip_and_unassigned_part(spark, tmp_path):
    df = edges_df(spark, [(0, 1), (1, 2), (7, 8)])
    asg = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "vid long, part int"
    )  # 7 and 8 unassigned
    path = str(tmp_path / "loc1")
    save_edges_locality(df, asg, path)
    back = load_edges_locality(spark, path)
    got = sorted((r.src, r.dst, r.part) for r in back.collect())
    assert got == [(0, 1, 0), (1, 2, 0), (7, 8, -1)]


def test_partition_pruning_plan_and_files(spark, tmp_path):
    df = _community_edges(spark)
    res = partition_graph(spark, df, k=4, max_rounds=10, track_cut=False)
    path = str(tmp_path / "loc2")
    save_edges_locality(df, res.assignment, path)
    res.assignment.unpersist()
    one = load_edges_locality(spark, path, parts=[0])
    plan = _plan(one.select("src", "dst"))
    # the part predicate must land in PartitionFilters (directory pruning),
    # NOT PushedFilters (rowgroup skipping) — inputFiles() can't witness
    # this (it lists the relation's files before filter pruning)
    pf = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "part" in pf and "0" in pf, pf
    # and the rows really are the part-0 slice of the full table
    full = load_edges_locality(spark, path)
    assert one.count() == full.filter(F.col("part") == 0).count() > 0


def test_locality_concentrates_neighborhoods(spark, tmp_path):
    # community graph: for most vertices, >=half their incident edges live
    # in their own directory; under the hash layout a 4-way split keeps
    # only ~1/4 — the measurable read-locality win
    df = _community_edges(spark)
    res = partition_graph(spark, df, k=4, max_rounds=10, track_cut=False)
    path = str(tmp_path / "loc3")
    save_edges_locality(df, res.assignment, path)
    back = load_edges_locality(spark, path)
    total = back.count()
    same_part = (
        back.join(
            res.assignment.select(F.col("vid").alias("dst"), F.col("part").alias("pd")),
            "dst",
        )
        .filter(F.col("part") == F.col("pd"))
        .count()
    )
    res.assignment.unpersist()
    frac = same_part / total
    assert frac > 0.5, frac  # hash layout would give ~0.25


def test_empty_parts_list_reads_nothing(spark, tmp_path):
    df = edges_df(spark, [(0, 1)])
    asg = spark.createDataFrame([(0, 0), (1, 0)], "vid long, part int")
    path = str(tmp_path / "loc4")
    save_edges_locality(df, asg, path)
    assert load_edges_locality(spark, path, parts=[]).count() == 0


def test_multilevel_assignment_feeds_locality_store(spark, tmp_path):
    """Close the coarsen -> partition -> store loop end to end (VERDICT r4
    item 7): a partition_graph_multilevel assignment written through
    save_edges_locality must (a) prune to one part's directories in the
    plan, (b) return exactly that part's slice, and (c) still concentrate
    neighborhoods at least as well as hash layout."""
    from engine.algos.partition import partition_graph_multilevel

    df = _community_edges(spark)
    res = partition_graph_multilevel(
        spark, df, k=4, levels=1, coarse_rounds=10, refine_rounds=4,
    )
    path = str(tmp_path / "loc_ml")
    save_edges_locality(df, res.assignment, path)
    one = load_edges_locality(spark, path, parts=[1])
    plan = _plan(one.select("src", "dst"))
    pf = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "part" in pf and "1" in pf, pf
    full = load_edges_locality(spark, path)
    assert one.count() == full.filter(F.col("part") == 1).count()
    total = full.count()
    same_part = (
        full.join(
            res.assignment.select(
                F.col("vid").alias("dst"), F.col("part").alias("pd")
            ),
            "dst",
        )
        .filter(F.col("part") == F.col("pd"))
        .count()
    )
    res.assignment.unpersist()
    assert same_part / total > 0.5, same_part / total
