"""Balanced k-way graph partitioning — Spinner-style label propagation.

Why this operator exists: the north rule says "partitioning / shuffle /
skew handled explicitly". Hash partitioning (what every `repartition(P,
"src")` in this engine does) balances perfectly but cuts ~(1-1/k) of the
edges; for a 10^12-edge graph whose iterative workloads shuffle along
edges every round, a LOCALITY-AWARE assignment that keeps most edges
inside a partition is the difference between an O(E) network exchange
per iteration and an O(cut) one. This module computes that assignment as
data (vid -> part), to be used as the key for `DataFrameWriter.
partitionBy` / bucketing or as a custom shuffle key.

Public semantics: Spinner (Martella, Logothetis, Siganos, Hodson —
"Spinner: Scalable Graph Partitioning in the Cloud", ICDE 2017): label
propagation where the label IS the partition id, scoring a candidate
partition by the fraction of a vertex's neighbors already there plus a
penalty for loaded partitions, under a degree-weighted capacity
``C = (1 + slack) * total_degree / k``.

Spark shape (all set-oriented, no per-vertex driver logic):

* Neighbor-label histogram: one equi-join (edges x labels on dst) + one
  (src, part) partial-agg count per round — the same O(E) gather shape
  as PageRank, so everything known about its scaling applies.
* Partition loads are k scalars — collected to the driver each round
  (scalar-only driver traffic, the repo's loop contract) and joined
  back as a broadcast k-row table.
* Capacity enforcement is deterministic, not probabilistic (Spinner
  migrates with a probability; a Spark-first design wants bit-stable
  reruns): candidate movers queue per target partition in (gain desc,
  vid asc) order and a running-sum window admits prefixes whose degree
  mass fits the remaining capacity. One window over the candidate set —
  O(movers log movers) in the shuffle, never O(V).
* Oscillation control: a mover must strictly improve its own score by
  ``min_gain``, and each round a deterministic per-round coin
  (pmod(xxhash64(vid, round), 2) == 0) halves the active movers — the
  classic LPA A<->B flip-flop of two adjacent vertices breaks in the
  first round where the coin activates exactly one of them, and the
  coin is re-drawn every round so no pair is starved forever.
* Capacity deadlock control: when two partitions both sit at capacity
  no single move fits even though a balanced improvement exists; a
  Kernighan–Lin-style exchange pass pairs capacity-blocked candidates
  in opposite directions by gain rank and admits the longest swap
  prefix both sides' budgets allow (hard bound preserved — budgets
  split each partition's slack across the pair-flows touching it).

Termination: fixpoint = no vertex strictly wants to move (checked on
the UNGATED candidate set, so a coin-idle round is never mistaken for
convergence); otherwise the rounds cap, with ``converged=False`` —
the assignment is still valid and balanced, just a plateau. Edge-cut
per round is optional reporting (``track_cut``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engine.algos.loopstate import fresh_checkpoint
from engine.algos.pagerank import iterative_conf


@dataclass
class PartitionResult:
    """``assignment``: (vid, part) for every vertex incident to an edge —
    caller-owned eager checkpoint (unpersist when retired). ``cut_history``
    has one entry per round (undirected edge-cut AFTER that round's
    moves), or just the final cut when ``track_cut=False``.
    ``loads``: final degree-weighted load per partition (k floats).
    ``capacity``: the degree-mass bound every round respected."""

    assignment: DataFrame
    k: int
    rounds: int
    converged: bool
    cut_history: list[float]  # weighted; == edge counts when unweighted
    loads: dict[int, float]
    capacity: float


def partition_graph(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    slack: float = 0.05,
    penalty: float = 1.0,
    min_gain: float = 1e-9,
    max_rounds: int = 30,
    track_cut: bool = True,
    weight_col: str | None = None,
    initial_assignment: DataFrame | None = None,
) -> PartitionResult:
    """Balanced k-way partition of the undirected view of ``edges``.

    ``slack``: balance tolerance — every partition's degree-weighted
    load stays <= (1 + slack) * total_degree / k at every round end
    (provided the initial hash assignment respects it, which it does up
    to hash variance; enforcement is inflow-side).
    ``penalty``: weight of the load-balance term in Spinner's score.
    ``track_cut``: measure the edge-cut after every round (one extra
    O(E) join-count per round — reporting, not part of the algorithm;
    disable at scale and read the final cut from ``cut_history[-1]``,
    which is always measured).
    ``weight_col``: edge weights for locality, degree mass, capacity and
    cut (default: every edge weighs 1 — multiplicity semantics).
    ``initial_assignment``: (vid, part) warm start — the multilevel path
    projects a coarse partition down through this; vertices missing from
    it fall back to the hash init, out-of-range parts raise. A warm
    start that violates capacity is drained (enforcement is inflow-side)
    but the hard bound then only holds from the first compliant round.
    """
    if k < 2:
        raise ValueError(f"partition_graph: k must be >= 2, got {k}")
    # Scale-adaptive loop partitioning; size known before the dst-keyed
    # layout commits a partition count (symmetric view: row_bytes=32).
    with iterative_conf(spark, loop_rows=edges.count(), row_bytes=32):
        return _spinner(
            spark, edges, k, slack, penalty, min_gain, max_rounds, track_cut,
            weight_col, initial_assignment,
        )


def _spinner(
    spark, edges, k, slack, penalty, min_gain, max_rounds, track_cut,
    weight_col, initial_assignment,
):
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Undirected multigraph view: both orientations, self-loops dropped.
    # Parallel edges KEPT — Spinner's score weights a neighbor by edge
    # multiplicity (or the explicit weight), and the weighted histogram
    # does exactly that for free.
    wexpr = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    fwd = edges.select("src", "dst", wexpr.alias("w")).filter(
        F.col("src") != F.col("dst")
    )
    # Partitioned by DST, not src: the per-round neighbor-histogram join
    # keys on dst, so this one-time layout removes an O(E) exchange from
    # EVERY round (labels stay hash(vid)-partitioned and the vid->dst
    # rename preserves that, so the round's gather join moves nothing).
    und = (
        fwd.union(
            fwd.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .repartition(P, "dst")
        .localCheckpoint(eager=True)
    )
    # The view is symmetric, so per-vertex incident mass read off the dst
    # column equals the src-side degree — and groupBy(dst) lands on und's
    # own partitioning (no exchange).
    deg = und.groupBy(F.col("dst").alias("src")).agg(F.sum("w").alias("deg"))
    total_deg = float(und.agg(F.sum("w")).collect()[0][0] or 0.0)
    if total_deg == 0:
        und.unpersist()
        raise ValueError("partition_graph: no non-loop edges")
    capacity = (1.0 + slack) * total_deg / k

    # Initial assignment: warm start when given (missing vids -> hash),
    # else hash — balanced up to variance, locality-free.
    hash_part = F.pmod(F.xxhash64("vid"), F.lit(k)).cast("int")
    base = deg.select(F.col("src").alias("vid"), "deg")
    if initial_assignment is not None:
        init = initial_assignment.select(
            "vid", F.col("part").cast("int").alias("init_part")
        )
        bad = init.filter(
            (F.col("init_part") < 0) | (F.col("init_part") >= k)
        ).limit(1).count()
        if bad:
            und.unpersist()
            raise ValueError(
                f"partition_graph: initial_assignment has parts outside "
                f"[0, {k})"
            )
        start = base.join(init, "vid", "left").select(
            "vid", F.coalesce("init_part", hash_part).alias("part"), "deg"
        )
    else:
        start = base.select("vid", hash_part.alias("part"), "deg")

    # Partition loads ride each labels materialization as an Observation
    # (k scalar sums in the same job) instead of a dedicated
    # groupBy+collect job per round; very large k falls back to the job.
    use_load_obs = k <= 64

    def _ckpt_labels(df):
        if not use_load_obs:
            return fresh_checkpoint(df), None
        ob = Observation()
        out = fresh_checkpoint(
            df.observe(
                ob,
                *[
                    F.sum(F.when(F.col("part") == p, F.col("deg"))).alias(f"l{p}")
                    for p in range(k)
                ],
            )
        )
        return out, ob

    def _loads_of(lbls, ob):
        if ob is None:
            return {
                int(r.part): float(r.load)
                for r in lbls.groupBy("part")
                .agg(F.sum("deg").alias("load"))
                .collect()
            }
        vals = ob.get
        return {p: float(vals[f"l{p}"] or 0.0) for p in range(k)}

    labels, labels_obs = _ckpt_labels(start.repartition(P, "vid"))

    cut_history: list[float] = []  # weighted; == edge counts when unweighted
    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # Neighbor-partition histogram w(v, p): the O(E) gather. und is
        # hash(dst)-partitioned and labels hash(vid)-partitioned, so the
        # join moves neither side; the only O(E)-input exchange left in
        # the round is the partially-aggregated (vid, np) histogram.
        hist = (
            und.join(
                labels.select(F.col("vid").alias("dst"), F.col("part").alias("np")),
                "dst",
            )
            .groupBy(F.col("src").alias("vid"), F.col("np"))
            .agg(F.sum("w").alias("w"))
        )
        # k partition loads (observed on the labels materialization —
        # scalar-only driver traffic), back as a broadcast k-row table.
        loads = _loads_of(labels, labels_obs)
        load_df = F.broadcast(
            spark.createDataFrame(
                [(p, loads.get(p, 0.0)) for p in range(k)],
                "np int, load double",
            )
        )
        # Spinner score for every (v, candidate p with >=1 neighbor there).
        scored = (
            hist.join(load_df, "np")
            .join(labels.select("vid", "part", "deg"), "vid")
            .select(
                "vid",
                "part",
                "deg",
                "np",
                (
                    F.col("w") / F.col("deg")
                    + F.lit(penalty) * (F.lit(1.0) - F.col("load") / F.lit(capacity))
                ).alias("score"),
            )
        )
        best = (
            scored.groupBy("vid")
            .agg(
                F.max(F.struct("score", F.col("np").alias("p"))).alias("b"),
                F.first("part").alias("part"),
                F.first("deg").alias("deg"),
                # score of STAYING; 0 neighbors in the current partition
                # produces no row -> null, coalesced below
                F.max(
                    F.when(F.col("np") == F.col("part"), F.col("score"))
                ).alias("stay"),
            )
            # current partition's load for the no-neighbor stay fallback
            .join(
                load_df.select(
                    F.col("np").alias("part"), F.col("load").alias("cur_load")
                ),
                "part",
            )
        )
        stay_term = F.coalesce(
            F.col("stay"),
            # no neighbor in the current partition: locality term is 0,
            # balance term still applies to the CURRENT partition's load
            F.lit(penalty)
            * (F.lit(1.0) - F.col("cur_load") / F.lit(capacity)),
        )
        # movers: strict gain over staying. Oscillation control (the
        # classic LPA a<->b flip-flop of adjacent vertices) is a
        # per-ROUND deterministic coin — xxhash64(vid, round) — so a
        # symmetric pair eventually hits a round where exactly one of
        # them is active; a static per-vertex class would let same-class
        # neighbors oscillate forever AND would split opposite-direction
        # movers across rounds, starving the exchange pass.
        wobs = Observation()
        want = (
            best.filter(
                (F.col("b.p") != F.col("part"))
                & (F.col("b.score") > stay_term + F.lit(min_gain))
            )
            .select(
                "vid",
                "deg",
                F.col("part").alias("old"),
                F.col("b.p").alias("new"),
                (F.col("b.score") - stay_term).alias("gain"),
            )
            .observe(wobs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_want = int(wobs.get["n"] or 0)
        if n_want == 0:
            want.unpersist()
            converged = True
            break
        cand = want.filter(
            F.pmod(F.xxhash64("vid", F.lit(rounds)), F.lit(2)) == F.lit(0)
        )
        # Deterministic capacity admission, two passes — both preserve the
        # hard bound load_p <= capacity at every round end:
        #
        # FLOW pass: per target partition, admit the (gain desc, vid asc)
        # prefix whose cumulative degree fits the remaining capacity
        # computed from start-of-round loads. Leavers only free mass, so
        # end load <= start load + admitted inflow <= capacity.
        #
        # EXCHANGE pass (Kernighan–Lin-style swaps, public knowledge):
        # when two partitions BOTH sit near capacity, no single move fits
        # and the flow pass deadlocks even though a balanced improvement
        # exists (two cliques split across two full partitions). Blocked
        # candidates in opposite directions (a->b and b->a) are paired by
        # rank and admitted as swaps for the longest prefix along which
        # BOTH partitions stay within capacity (running-min window over
        # the paired degree deltas).
        wn = Window.partitionBy("new").orderBy(
            F.col("gain").desc(), F.col("vid").asc()
        )
        rem_df = F.broadcast(
            spark.createDataFrame(
                [(p, max(0.0, capacity - loads.get(p, 0.0))) for p in range(k)],
                "new int, rem double",
            )
        )
        # All the flow pass's driver scalars — candidate count, admitted
        # count, per-partition admitted in/outflow — ride the ONE flow
        # materialization as Observations (pre- and post-filter), so the
        # former three follow-up jobs (two groupBy collects + the blocked
        # probe) cost nothing.
        pre_obs = Observation()
        post_obs = Observation()
        flow = (
            cand.join(rem_df, "new")
            .observe(pre_obs, F.count(F.lit(1)).alias("n"))
            .withColumn("cum", F.sum("deg").over(wn))
            .filter(F.col("cum") <= F.col("rem"))
            .select("vid", "old", "new", "deg")
            .observe(
                post_obs,
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.when(F.col("new") == p, F.col("deg"))).alias(f"in{p}")
                    for p in range(k)
                ],
                *[
                    F.sum(F.when(F.col("old") == p, F.col("deg"))).alias(f"out{p}")
                    for p in range(k)
                ],
            )
            .localCheckpoint(eager=True)
        )
        n_cand = int(pre_obs.get["n"] or 0)
        fv = post_obs.get
        n_flow = int(fv["n"] or 0)
        loads1 = dict(loads)
        for p in range(k):
            loads1[p] = (
                loads1.get(p, 0.0)
                + float(fv[f"in{p}"] or 0.0)
                - float(fv[f"out{p}"] or 0.0)
            )
        # early-out: when the flow pass admitted everyone, skip the
        # exchange machinery entirely (checkpoint + pair collect saved —
        # the common case once partitions have headroom)
        swaps = None
        if n_cand > n_flow:
            blocked = cand.join(flow.select("vid"), "vid", "left_anti")
            swaps = _exchange_pass(spark, blocked, loads1, capacity, k)
        admitted = flow.select("vid", F.col("new").alias("part2"))
        if swaps is not None:
            admitted = admitted.union(
                swaps.select("vid", F.col("new").alias("part2"))
            )
        new_labels, labels_obs = _ckpt_labels(
            labels.join(admitted, "vid", "left")
            .select(
                "vid",
                F.coalesce("part2", "part").alias("part"),
                "deg",
            )
            .repartition(P, "vid")
        )
        labels.unpersist()
        labels = new_labels
        want.unpersist()
        flow.unpersist()
        if swaps is not None:
            swaps.unpersist()
        if track_cut:
            cut_history.append(_wcut(und, labels))
    final_loads = _loads_of(labels, labels_obs)
    if not cut_history:
        # track_cut=False, or round-1 convergence broke before any append:
        # the final cut is always measured (the docstring promises [-1])
        cut_history.append(_wcut(und, labels))
    und.unpersist()
    return PartitionResult(
        assignment=labels.select("vid", "part"),
        k=k,
        rounds=rounds,
        converged=converged,
        cut_history=cut_history,
        loads=final_loads,
        capacity=capacity,
    )


def _exchange_pass(spark, blocked, loads1, capacity, k):
    """Pair capacity-blocked opposite-direction candidates (a->b with
    b->a) by gain rank and admit the longest swap prefix each side's
    budget allows. Budgets split each partition's remaining slack evenly
    across the pair-flows touching it, so simultaneous swaps over
    different pairs can never jointly overshoot: sum of a's per-pair
    inflow bounds == capacity - load_a. Returns (vid, new)."""
    wf = Window.partitionBy("old", "new").orderBy(
        F.col("gain").desc(), F.col("vid").asc()
    )
    ranked = blocked.select(
        "vid", "old", "new", "deg", "gain", F.row_number().over(wf).alias("rn")
    ).localCheckpoint(eager=True)
    pair_rows = (
        ranked.select(
            F.least("old", "new").alias("pa"), F.greatest("old", "new").alias("pb")
        )
        .distinct()
        .collect()
    )
    if not pair_rows:
        out = ranked.select("vid", "new").limit(0).localCheckpoint(eager=True)
        ranked.unpersist()
        return out
    touch: dict[int, int] = {}
    for r in pair_rows:
        touch[int(r.pa)] = touch.get(int(r.pa), 0) + 1
        touch[int(r.pb)] = touch.get(int(r.pb), 0) + 1
    budgets = F.broadcast(
        spark.createDataFrame(
            [
                (
                    int(r.pa),
                    int(r.pb),
                    max(0.0, capacity - loads1.get(int(r.pa), 0.0))
                    / touch[int(r.pa)],
                    max(0.0, capacity - loads1.get(int(r.pb), 0.0))
                    / touch[int(r.pb)],
                )
                for r in pair_rows
            ],
            "pa int, pb int, budget_a double, budget_b double",
        )
    )
    l1 = ranked.filter(F.col("old") < F.col("new")).select(
        F.col("vid").alias("vid1"),
        F.col("old").alias("pa"),
        F.col("new").alias("pb"),
        F.col("deg").alias("deg1"),
        "rn",
    )
    l2 = ranked.filter(F.col("old") > F.col("new")).select(
        F.col("vid").alias("vid2"),
        F.col("new").alias("pa"),
        F.col("old").alias("pb"),
        F.col("deg").alias("deg2"),
        "rn",
    )
    paired = l1.join(l2, ["pa", "pb", "rn"]).join(budgets, ["pa", "pb"])
    run = (
        Window.partitionBy("pa", "pb")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy("pa", "pb").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # net inflow to pa after taking the prefix ending at this row; the
    # constraint only binds at the CHOSEN prefix end (swaps are
    # simultaneous), so take the LARGEST rank whose prefix is valid
    scored = paired.select(
        "*",
        (F.sum("deg2").over(run) - F.sum("deg1").over(run)).alias("net_a"),
    ).select(
        "*",
        F.max(
            F.when(
                (F.col("net_a") <= F.col("budget_a"))
                & (-F.col("net_a") <= F.col("budget_b")),
                F.col("rn"),
            )
        )
        .over(full)
        .alias("mstar"),
    )
    taken = scored.filter(F.col("rn") <= F.col("mstar"))
    moves = taken.select(F.col("vid1").alias("vid"), F.col("pb").alias("new")).union(
        taken.select(F.col("vid2").alias("vid"), F.col("pa").alias("new"))
    )
    out = moves.localCheckpoint(eager=True)
    ranked.unpersist()
    return out


def _wcut(und, labels) -> float:
    """Weighted undirected cut from the both-orientations view (each
    discordant undirected edge appears twice -> /2)."""
    tot = (
        und.join(
            labels.select(F.col("vid").alias("src"), F.col("part").alias("ps")),
            "src",
        )
        .join(
            labels.select(F.col("vid").alias("dst"), F.col("part").alias("pd")),
            "dst",
        )
        .filter(F.col("ps") != F.col("pd"))
        .agg(F.sum("w"))
        .collect()[0][0]
    )
    return float(tot or 0.0) / 2


def partition_graph_multilevel(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    levels: int = 2,
    coarse_rounds: int = 30,
    refine_rounds: int = 6,
    weight_col: str | None = None,
    **kwargs,
) -> PartitionResult:
    """METIS-style multilevel partitioning: coarsen ``levels`` matchings
    (engine/algos/coarsen.py), run the full Spinner loop on the coarse
    WEIGHTED graph (a fraction of the vertices — the locality structure
    is decided cheaply there), project labels down through the composed
    vertex map, then refine on the full graph for ``refine_rounds``
    warm-started rounds. Public scheme: Karypis & Kumar 1998 (METIS);
    the refinement is partition_graph's own gated LPA instead of KL/FM.

    Same result contract as :func:`partition_graph` — the returned
    rounds/cut_history/converged describe the REFINEMENT stage.
    """
    from engine.algos.coarsen import coarsen_graph

    cg = coarsen_graph(spark, edges, levels=levels, weight_col=weight_col)
    try:
        if cg.levels_done == 0:
            return partition_graph(
                spark, edges, k, max_rounds=refine_rounds,
                weight_col=weight_col, **kwargs,
            )
        # Cut tracking is pointless on the throwaway coarse solve (its cut
        # is in contracted-weight units); force it off while still letting
        # callers pass track_cut for the refinement stage.
        coarse_kwargs = {**kwargs, "track_cut": False}
        coarse = partition_graph(
            spark, cg.edges, k, max_rounds=coarse_rounds,
            weight_col="weight", **coarse_kwargs,
        )
        init = (
            cg.vertex_map.join(
                coarse.assignment.withColumnRenamed("vid", "cvid"), "cvid"
            )
            .select("vid", "part")
            .localCheckpoint(eager=True)
        )
        coarse.assignment.unpersist()
        fine = partition_graph(
            spark, edges, k, max_rounds=refine_rounds,
            weight_col=weight_col, initial_assignment=init, **kwargs,
        )
        init.unpersist()
        return fine
    finally:
        cg.edges.unpersist()
        cg.vertex_map.unpersist()


def edge_cut(edges: DataFrame, assignment: DataFrame) -> int:
    """Undirected edge-cut of ``assignment`` over ``edges`` (self-loops
    ignored; parallel edges each counted)."""
    und = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        und.join(
            assignment.select(F.col("vid").alias("src"), F.col("part").alias("ps")),
            "src",
        )
        .join(
            assignment.select(F.col("vid").alias("dst"), F.col("part").alias("pd")),
            "dst",
        )
        .filter(F.col("ps") != F.col("pd"))
        .count()
    )
