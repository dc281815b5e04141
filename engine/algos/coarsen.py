"""Graph coarsening — matching contraction, the multilevel building block.

Public semantics: the coarsening phase of multilevel graph algorithms
(METIS, Karypis & Kumar 1998; multilevel Louvain/partitioning practice):
compute a maximal matching, contract every matched pair into one
supervertex, aggregate parallel edge weights, repeat. Each level removes
up to half the vertices; a handful of levels shrinks a graph by orders
of magnitude while preserving its cut structure approximately — the
input a multilevel partitioner/layout/community algorithm refines back
up through the ``maps`` chain.

Spark shape:

* The matching is the engine's own set-oriented local-min matching
  (engine/algos/matching.py — hash priorities, bit-deterministic).
* Contraction is two equi-joins (map each endpoint to its supervertex)
  + one partial-agg weight sum; self-pairs become supervertex internal
  weight, reported separately (they carry the contracted edge's weight
  — dropping them silently would break weight conservation).
* Supervertex id = min(lo, hi) of the matched pair — stable,
  partition-free, and composable across levels by joining the maps.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.algos.matching import maximal_matching


@dataclass
class CoarsenResult:
    """``edges``: (src, dst, weight) coarse simple graph, src < dst —
    caller-owned checkpoint. ``vertex_map``: (vid, cvid) for EVERY input
    vertex (unmatched vertices map to themselves) composed across all
    levels. ``internal_weight``: total weight contracted inside
    supervertices (conservation: coarse + internal == input total).
    ``levels_done`` may stop short of the request when a level no longer
    shrinks the graph (empty matching) — honest, not silent."""

    edges: DataFrame
    vertex_map: DataFrame
    internal_weight: float
    levels_done: int


def coarsen_graph(
    spark: SparkSession,
    edges: DataFrame,
    levels: int = 1,
    weight_col: str | None = None,
) -> CoarsenResult:
    """Contract ``levels`` maximal matchings of the undirected simple
    view of ``edges``. Parallel input edges are pre-merged by weight sum
    (unweighted: weight = multiplicity)."""
    if levels < 1:
        raise ValueError(f"coarsen_graph: levels must be >= 1, got {levels}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    cur = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            w.alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .localCheckpoint(eager=True)
    )
    vmap = (
        cur.select(F.col("src").alias("vid"))
        .union(cur.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").alias("cvid"))
        .localCheckpoint(eager=True)
    )
    internal = 0.0
    done = 0
    for done in range(1, levels + 1):
        m = maximal_matching(spark, cur)
        if not m.converged:
            m.edges.unpersist()
            raise RuntimeError(
                "coarsen_graph: matching did not reach maximality — raise "
                "its iteration budget (a partial matching would contract "
                "less than the level promises)"
            )
        if m.edges.limit(1).count() == 0:
            m.edges.unpersist()
            done -= 1
            break
        # supervertex = min endpoint of the matched pair; everyone else
        # maps to themselves
        pair_map = m.edges.select(
            F.col("hi").alias("vid"), F.col("lo").alias("cvid")
        )
        step = (
            vmap.select("vid", F.col("cvid").alias("old"))
            .join(pair_map.withColumnRenamed("vid", "old"), "old", "left")
            .select("vid", F.coalesce("cvid", "old").alias("cvid"))
            .localCheckpoint(eager=True)
        )
        vmap.unpersist()
        vmap = step
        relabeled = (
            cur.join(
                pair_map.withColumnRenamed("vid", "src").withColumnRenamed(
                    "cvid", "ms"
                ),
                "src",
                "left",
            )
            .join(
                pair_map.withColumnRenamed("vid", "dst").withColumnRenamed(
                    "cvid", "md"
                ),
                "dst",
                "left",
            )
            .select(
                F.coalesce("ms", "src").alias("a"),
                F.coalesce("md", "dst").alias("b"),
                "weight",
            )
        )
        internal += (
            relabeled.filter(F.col("a") == F.col("b"))
            .agg(F.sum("weight"))
            .collect()[0][0]
            or 0.0
        )
        nxt = (
            relabeled.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("src"),
                F.greatest("a", "b").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        cur.unpersist()
        cur = nxt
        m.edges.unpersist()
    return CoarsenResult(
        edges=cur, vertex_map=vmap, internal_weight=internal, levels_done=done
    )
