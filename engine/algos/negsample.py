"""Negative edge sampling — corrupted (src, dst) pairs for training
link predictors / GNNs / embedding models.

Public semantics: the corruption scheme of TransE (Bordes et al. 2013)
and every GNN link-prediction recipe since — for each positive edge,
draw ``n_per_pos`` corrupted pairs by replacing the destination with a
vertex drawn from the (optionally degree^power-weighted) vertex
distribution, rejecting corruptions that collide with a real edge.

Spark shape — deterministic and set-oriented:

* Candidate destinations come from :func:`engine.sampling.weighted_draws`
  (bucketized categorical sampler: cumulative intervals over the
  vocabulary-sized vertex dict, draws routed by equi-join — already the
  word2vec negative-sampling machinery, power=0.75 default there).
* Collisions with true edges are removed by ONE left-anti join against
  the edge table; rejected draws are RE-DRAWN in rounds (each round a
  fresh salt) until the quota fills or ``max_rounds`` exhausts — the
  repo's loud-cap policy applies, no silent short samples.
* Determinism: every draw is a pure hash of (edge row, draw index,
  round salt), so reruns and repartitions produce identical negatives —
  resumable training data (the engine-wide sampling contract).

The rejection loop terminates fast on sparse graphs (collision
probability ~ degree(src)/V per draw); dense-neighborhood vertices may
need the extra rounds, and a genuinely saturated vertex (connected to
everything) can never fill — that surfaces as the loud error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.sampling import weighted_draws


def sample_negative_edges(
    spark: SparkSession,
    edges: DataFrame,
    n_per_pos: int = 1,
    power: float = 0.75,
    salt: str = "negsample",
    max_rounds: int = 8,
) -> DataFrame:
    """(src, pos_dst, dst, neg_id) — ``n_per_pos`` corrupted
    destinations per positive edge (src, pos_dst); ``neg_id`` in
    [0, n_per_pos) indexes the slots of one positive. Guaranteed: no
    (src, dst) collides with a real edge, no duplicate destination
    within one positive's set, bit-deterministic.

    ``power``: destination distribution ∝ in-degree^power (0 = uniform
    over distinct destinations; 0.75 = the word2vec shape).
    Raises when a quota cannot be filled within ``max_rounds`` re-draw
    rounds (saturated vertices — a corpus-level signal, not a row to
    silently drop).
    """
    if n_per_pos < 1:
        raise ValueError(
            f"sample_negative_edges: n_per_pos must be >= 1, got {n_per_pos}"
        )
    e = (
        edges.select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    try:
        # destination vocabulary with raw in-degree weights (power is
        # applied inside weighted_draws)
        vocab = (
            e.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumnRenamed("dst", "item")
        )
        # pending quota rows: one per (positive edge, draw index)
        pend = e.select(
            "src",
            F.col("dst").alias("pos_dst"),
            F.explode(
                F.sequence(F.lit(0), F.lit(int(n_per_pos) - 1))
            ).alias("neg_id"),
        ).localCheckpoint(eager=True)
        done = None
        for rnd in range(max_rounds):
            draws = pend.select(
                "src",
                "pos_dst",
                "neg_id",
                # the per-round re-salt is what makes rejected slots draw a
                # FRESH destination next round instead of the same one
                F.xxhash64(
                    "src", "pos_dst", "neg_id", F.lit(f"{salt}:{rnd}")
                ).alias("draw_id"),
            )
            got = weighted_draws(
                vocab,
                draws.select("draw_id"),
                weight_col="n",
                item_col="item",
                power=power,
                seed=13 + rnd,
            )
            cand = draws.join(got, "draw_id").select(
                "src", "pos_dst", "neg_id", F.col("item").alias("dst")
            )
            # reject real edges (incl. the positive itself) and duplicate
            # destinations within one positive's already-accepted set
            ok = cand.join(e, ["src", "dst"], "left_anti")
            if done is not None:
                ok = ok.join(
                    done.select("src", "pos_dst", "dst"),
                    ["src", "pos_dst", "dst"],
                    "left_anti",
                )
            # one accepted row per pending slot; same-round repeats of one
            # destination within a positive resolve DETERMINISTICALLY to
            # the lowest slot (dropDuplicates would pick an arbitrary row)
            ok = (
                ok.groupBy("src", "pos_dst", "dst")
                .agg(F.min("neg_id").alias("neg_id"))
                .localCheckpoint(eager=True)
            )
            done = ok if done is None else done.unionByName(ok).localCheckpoint(
                eager=True
            )
            pend_next = pend.join(
                done.select("src", "pos_dst", "neg_id"),
                ["src", "pos_dst", "neg_id"],
                "left_anti",
            ).localCheckpoint(eager=True)
            pend.unpersist()
            pend = pend_next
            if pend.limit(1).count() == 0:
                out = done.select(
                    "src", "pos_dst", "dst", "neg_id"
                ).localCheckpoint(eager=True)
                done.unpersist()
                pend.unpersist()
                return out
        short = pend.count()
        pend.unpersist()
        if done is not None:
            done.unpersist()
        raise RuntimeError(
            f"sample_negative_edges: {short} draw slots unfilled after "
            f"{max_rounds} rounds — saturated vertices (or n_per_pos too "
            "large for the destination vocabulary); raise max_rounds or "
            "lower n_per_pos"
        )
    finally:
        e.unpersist()
