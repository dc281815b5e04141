"""t2: Verum context query (k-hop + dont_follow) vs NetworkX BFS oracle."""

from pyspark.sql import functions as F

from engine.algos.query import context_query
from tests.oracles import khop_oracle, nx_digraph


def _vtypes(v):
    return {r.vid: r.vtype for r in v.select("vid", "vtype").collect()}


def test_khop_depths_match_oracle(spark, tiny_graph, tiny_nx):
    v, e = tiny_graph
    seed = v.filter("vtype = 'repo'").orderBy("vid").limit(2)
    seeds = [r.vid for r in seed.collect()]
    sub_v, sub_e = context_query(
        spark, v, e, seed.select("vid"), max_depth=3, dont_follow=("lang", "commit")
    )
    ours = {r.vid: r.depth for r in sub_v.collect()}
    ref = khop_oracle(tiny_nx, _vtypes(v), seeds, 3, {"lang", "commit"})
    assert ours == ref


def test_dont_follow_prunes_expansion(spark, tiny_graph, tiny_nx):
    """Blocking 'path' expansion keeps the context to depth-1-ish shells."""
    v, e = tiny_graph
    seed = v.filter("vtype = 'repo'").orderBy("vid").limit(1)
    seeds = [r.vid for r in seed.collect()]
    sub_v, _ = context_query(
        spark, v, e, seed.select("vid"), max_depth=4,
        dont_follow=("path", "lang", "commit"),
    )
    ours = {r.vid: r.depth for r in sub_v.collect()}
    ref = khop_oracle(tiny_nx, _vtypes(v), seeds, 4, {"path", "lang", "commit"})
    assert ours == ref


def test_induced_edges_are_within_subgraph(spark, tiny_graph):
    v, e = tiny_graph
    seed = v.filter("vtype = 'repo'").orderBy("vid").limit(1)
    sub_v, sub_e = context_query(spark, v, e, seed.select("vid"), max_depth=2)
    keep = sub_v.select("vid")
    assert sub_e.join(keep.withColumnRenamed("vid", "src"), "src", "left_anti").count() == 0
    assert sub_e.join(keep.withColumnRenamed("vid", "dst"), "dst", "left_anti").count() == 0
