"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000 / TOIS 2001 — public knowledge).

The degree-normalized cousin of HITS (engine/algos/hits.py) and the
engine's recommendation-flavored scorer: where HITS lets one dense
community absorb all the score (TKC effect), SALSA's scores follow a
random walk on the BIPARTITE SUPPORT GRAPH — hub-copies on one side,
authority-copies on the other, one bipartite edge per link u->v — and are
therefore local to each component.

The authority chain steps v --(uniform in-edge back)--> u --(uniform
out-edge forward)--> w. Lempel & Moran prove its stationary distribution
needs NO power iteration: within a connected component c of the support
graph the stationary weight of authority v is proportional to in-degree,
and components are weighted by their share of the authority side:

    a(v) = (|A_c| / |A|) * indeg(v) / D_c
    h(u) = (|H_c| / |H|) * outdeg(u) / D_c

with D_c = number of links in component c (= total in-degree of A_c =
total out-degree of H_c). So the whole algorithm is set-oriented and
CLOSED-FORM — exactly the kind of operator that should never loop:

  1. degrees (one groupBy each side);
  2. connected components of the support graph — hub-copy of u is vertex
     2u, authority-copy of v is 2v+1; reuses engine.algos.cc
     (Kiveris large-star/small-star, already scale-proven);
  3. three broadcast-sized per-component aggregates joined back.

Everything shuffles on vid; the only iteration is inside the proven CC
loop. Self-loops participate (u->u makes u both hub and authority, as in
the paper's support-graph construction); parallel links collapse
(simple-digraph view, consistent with hits()).

Oracle (tests/test_salsa.py): a numpy power iteration of the literal
two-step chains converges to these scores (1e-9), and a pure-Python
closed-form mirror matches exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.algos.cc import connected_components


@dataclass
class SALSAResult:
    scores: DataFrame   # (vid, hub, authority) — each column sums to 1
    n_components: int   # components of the bipartite support graph


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
) -> SALSAResult:
    """SALSA hub/authority scores of the simple digraph ``edges``
    (src, dst). Vertices with no out-edges have hub 0; no in-edges,
    authority 0; ``vertices`` optionally adds edge-less rows (0, 0)."""
    links = edges.select("src", "dst").distinct()
    if links.isEmpty():
        base = vertices.select("vid") if vertices is not None else links.select(
            F.col("src").alias("vid")
        )
        return SALSAResult(
            base.select(
                "vid", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
            ),
            0,
        )

    # Support graph: hub-copy 2u -- authority-copy 2v+1 per link.
    support = links.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    cc = connected_components(spark, support)
    # (vid, label) over the copied vertex space; label = min copied vid.
    comp = cc.labels.withColumnRenamed("label", "component")

    # Components must be read off the matching SIDE of the copy space:
    # hub copies are the even ids, authority copies the odd ones.
    hub_comp = comp.filter(F.col("vid") % 2 == 0).select(
        (F.col("vid") / 2).cast("long").alias("vid"), F.col("component").alias("c")
    )
    auth_comp = comp.filter(F.col("vid") % 2 == 1).select(
        ((F.col("vid") - 1) / 2).cast("long").alias("vid"),
        F.col("component").alias("c"),
    )
    hubs = (
        links.groupBy(F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .join(hub_comp, "vid")
    )
    auths = (
        links.groupBy(F.col("dst").alias("vid"))
        .agg(F.count(F.lit(1)).alias("indeg"))
        .join(auth_comp, "vid")
    )

    # Per-component: side sizes and link mass D_c. These are at most
    # n_components rows — broadcast back onto the vid-sized sides.
    comp_stats = (
        hubs.groupBy("c").agg(
            F.count(F.lit(1)).alias("h_c"), F.sum("outdeg").alias("d_c")
        )
        .join(
            auths.groupBy("c").agg(F.count(F.lit(1)).alias("a_c")),
            "c",
        )
    )
    n_h, n_a, n_comp = (
        comp_stats.agg(
            F.sum("h_c"), F.sum("a_c"), F.count(F.lit(1))
        ).collect()[0]
    )
    n_h, n_a, n_comp = int(n_h), int(n_a), int(n_comp)

    h_scores = hubs.join(F.broadcast(comp_stats), "c").select(
        "vid",
        (
            (F.col("h_c") / F.lit(n_h)) * (F.col("outdeg") / F.col("d_c"))
        ).alias("hub"),
    )
    a_scores = auths.join(F.broadcast(comp_stats), "c").select(
        "vid",
        (
            (F.col("a_c") / F.lit(n_a)) * (F.col("indeg") / F.col("d_c"))
        ).alias("authority"),
    )
    scores = h_scores.join(a_scores, "vid", "full").select(
        "vid",
        F.coalesce("hub", F.lit(0.0)).alias("hub"),
        F.coalesce("authority", F.lit(0.0)).alias("authority"),
    )
    if vertices is not None:
        scores = (
            vertices.select("vid")
            .join(scores, "vid", "left")
            .select(
                "vid",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
        )
    return SALSAResult(scores, n_comp)


def salsa_mirror(edge_list):
    """Pure-Python closed form — the exact test oracle.
    Returns ({vid: hub}, {vid: authority})."""
    links = {(u, v) for u, v in edge_list}
    # Union-find over copied vertex space.
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        parent[find(x)] = find(y)

    outdeg: dict = {}
    indeg: dict = {}
    for u, v in links:
        union(("h", u), ("a", v))
        outdeg[u] = outdeg.get(u, 0) + 1
        indeg[v] = indeg.get(v, 0) + 1
    comp_h: dict = {}
    comp_a: dict = {}
    comp_d: dict = {}
    for u in outdeg:
        c = find(("h", u))
        comp_h[c] = comp_h.get(c, 0) + 1
        comp_d[c] = comp_d.get(c, 0) + outdeg[u]
    for v in indeg:
        comp_a[find(("a", v))] = comp_a.get(find(("a", v)), 0) + 1
    n_h, n_a = len(outdeg), len(indeg)
    hub = {
        u: (comp_h[find(("h", u))] / n_h) * (outdeg[u] / comp_d[find(("h", u))])
        for u in outdeg
    }
    auth = {
        v: (comp_a[find(("a", v))] / n_a) * (indeg[v] / comp_d[find(("a", v))])
        for v in indeg
    }
    return hub, auth
