"""t0/t1: derivation — hash invariant, edge kinds, dense vids, cooccur cap."""

from pyspark.sql import functions as F

from engine.derive import (
    cooccur_groups,
    derive_cooccur_edges,
    hash_invariant_violations,
    with_content_hash,
)


def test_hash_invariant_zero_violations(tiny_source):
    """BASELINE.json per-row invariant: pandas-UDF sha256 == F.sha2, all rows."""
    assert hash_invariant_violations(tiny_source) == 0


def test_all_edge_kinds_present(tiny_graph):
    _, e = tiny_graph
    rels = {r.rel for r in e.select("rel").distinct().collect()}
    assert rels == {"repo_path", "path_lang", "repo_commit", "cooccur"}


def test_vids_dense_and_consistent(tiny_graph):
    v, e = tiny_graph
    n = v.count()
    mm = v.agg(F.min("vid"), F.max("vid"), F.countDistinct("vid")).collect()[0]
    assert mm[0] == 0 and mm[1] == n - 1 and mm[2] == n
    # every edge endpoint resolves to a vertex
    assert e.join(v, e.src == v.vid, "left_anti").count() == 0
    assert e.join(v, e.dst == v.vid, "left_anti").count() == 0


def test_vid_assignment_deterministic(tiny_source, tiny_graph):
    from engine.derive import build_graph

    v1, _ = tiny_graph
    v2, _ = build_graph(tiny_source)
    assert v1.orderBy("vid").collect() == v2.orderBy("vid").collect()


def test_repo_path_edge_count_matches_distinct_pairs(tiny_source, tiny_graph):
    _, e = tiny_graph
    expect = tiny_source.select("repo", "path").distinct().count()
    assert e.filter("rel = 'repo_path'").count() == expect


def test_cooccur_cap_enforced(spark, tiny_source):
    hashed = with_content_hash(tiny_source)
    cap = 3
    pairs = derive_cooccur_edges(hashed, cap=cap, log_dropped=False)
    # with cap=3, any single hash contributes at most C(3,2)=3 pairs; the
    # heaviest surviving group must have <= cap members
    g = cooccur_groups(hashed, cap=cap).filter("NOT capped")
    assert g.agg(F.max("n_repos")).collect()[0][0] <= cap
    # pair weights are counts of shared hashes >= 1
    assert pairs.filter("weight < 1").count() == 0


def test_cooccur_pairs_unordered_unique(tiny_graph):
    _, e = tiny_graph
    co = e.filter("rel = 'cooccur'")
    # derivation emits each unordered pair once (src_name < dst_name)
    assert co.filter("src >= dst").count() + co.filter("src = dst").count() >= 0
    assert co.groupBy("src", "dst").count().filter("count > 1").count() == 0


def test_content_column_pruned_from_structural_scan(spark, tiny_source, tmp_path):
    """Scale guard: structural-edge derivation over a parquet corpus must
    push column pruning into the scan — `content` (the fat column) never
    leaves the file reader (SURVEY.md §4.2)."""
    from engine.derive import derive_structural_edges

    p = str(tmp_path / "src_parquet")
    tiny_source.write.parquet(p)
    df = derive_structural_edges(spark.read.parquet(p))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scans = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert scans, plan
    assert all("content" not in line for line in scans), "\n".join(scans)


def test_project_bipartite_matches_networkx(spark):
    """General one-mode projection == nx.bipartite.weighted_projected_graph
    on both sides; cap drops hub groups loudly, not silently."""
    import networkx as nx
    from networkx.algorithms import bipartite as nxb

    from engine.graph import project_bipartite
    from tests.conftest import edges_df

    # bipartite: left 0..9, right 100..105, deterministic membership
    pairs = [(u, 100 + (u * k) % 6) for u in range(10) for k in (1, 2, 3)]
    pairs = sorted(set(pairs))
    df = edges_df(spark, pairs)
    g = nx.Graph(pairs)
    left = {u for u, _ in pairs}
    for on, nodes in (("src", left), ("dst", {v for _, v in pairs})):
        got = {
            tuple(sorted((r.a, r.b))): r.weight
            for r in project_bipartite(df, on=on).collect()
        }
        proj = nxb.weighted_projected_graph(g, nodes)
        want = {
            tuple(sorted((u, v))): float(d["weight"])
            for u, v, d in proj.edges(data=True)
        }
        assert got == want, on
    # cap: right vertex 100 is shared by many lefts; a tiny cap removes
    # the pairs that only co-occur through over-cap groups
    capped = {
        tuple(sorted((r.a, r.b)))
        for r in project_bipartite(df, on="src", cap=3).collect()
    }
    uncapped = {
        tuple(sorted((r.a, r.b)))
        for r in project_bipartite(df, on="src").collect()
    }
    assert capped < uncapped
    with _pytest_raises_value("on must be"):
        project_bipartite(df, on="vid")


def _pytest_raises_value(match):
    import pytest as _p

    return _p.raises(ValueError, match=match)
