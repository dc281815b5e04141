"""Per-round benchmark. Prints ONE JSON line on stdout.

Headline: PageRank edges processed/sec/iteration on the repo->path->lang
link graph derived from a bench-scale synthetic source corpus
(BASELINE.json metric), plus derivation, CC/LPA/triangles, and a slice of
the relational/dedup/ANN surface at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SPARK_GRAFT_BENCH_ROWS    synthetic corpus rows (default 2,000,000)
  SPARK_GRAFT_BENCH_ITERS   pagerank iterations timed (default 12)

The N-vs-4N scaling evidence is produced by tools/scaling_bench.py
(CPU-pinned concurrent local[2]/local[8] pairs plus a serialized local[32]
point, identical input bytes), recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from engine.datagen import documents_as_source, source_files  # noqa: E402
from engine.derive import build_graph, hash_invariant_violations  # noqa: E402
from engine.session import get_spark  # noqa: E402
from engine.algos.betweenness import betweenness  # noqa: E402
from engine.algos.cc import connected_components  # noqa: E402
from engine.algos.kcore import core_numbers  # noqa: E402
from engine.algos.linkpred import link_scores  # noqa: E402
from engine.algos.lpa import label_propagation  # noqa: E402
from engine.algos.neighborhood import neighborhood_function  # noqa: E402
from engine.algos.msf import minimum_spanning_forest  # noqa: E402
from engine.algos.pagerank import pagerank, pagerank_delta  # noqa: E402
from engine.algos.partition import edge_cut, partition_graph  # noqa: E402
from engine.algos.temporal import earliest_arrival  # noqa: E402
from engine.algos.toposort import topological_layers  # noqa: E402
from engine.algos.triangles import triangle_count  # noqa: E402
from engine.algos.walks import random_walks  # noqa: E402
from engine import dedup as D  # noqa: E402
from engine import incremental as INC  # noqa: E402
from engine import relational as R  # noqa: E402
from engine import similarity as S  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
    # max_iter is a safety cap, NOT the expected stop: the metric is defined
    # "to 1e-6 convergence" (BASELINE.json), so the loop must be allowed to
    # actually converge (~85 iterations at alpha=0.85 on this graph).
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "150"))
    repos = max(100, rows // 400)

    spark = get_spark(cpus, app_name="verum-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.monotonic()
    q: dict[str, float] = {}
    extra: dict[str, object] = {}

    # ---- 1. synthetic bench corpus (no content: structural graph only).
    # Timed twice on identical parameters (r1->r2 measured 27->41s on the
    # same code; the repeat separates host weather from real regressions —
    # VERDICT r2 item 9): datagen = the persisted pass the rest of the
    # bench uses, datagen_repeat = a throwaway re-run, min is the signal.
    t0 = time.monotonic()
    src = source_files(spark, rows, repos, with_content=False).persist()
    n_src = src.count()
    q["datagen"] = time.monotonic() - t0
    t0 = time.monotonic()
    source_files(spark, rows, repos, with_content=False).count()
    q["datagen_repeat"] = time.monotonic() - t0
    log(f"datagen: {n_src} rows in {q['datagen']:.1f}s "
        f"(repeat {q['datagen_repeat']:.1f}s)")

    t0 = time.monotonic()
    v, e = build_graph(src, include_cooccur=False)
    v = v.persist()
    e = e.persist()
    n_v, n_e = v.count(), e.count()
    q["derive_structural"] = time.monotonic() - t0
    extra["graph"] = {"rows": n_src, "vertices": n_v, "edges": n_e}
    log(f"graph: V={n_v} E={n_e} in {q['derive_structural']:.1f}s")

    # ---- 2. PageRank throughput (the headline metric)
    t0 = time.monotonic()
    res = pagerank(spark, e, vertices=v, tol=1e-6, max_iter=iters)
    q["pagerank"] = time.monotonic() - t0
    iter_walls = [m["wall_s"] for m in res.metrics]
    eps = [m["edges_per_s"] for m in res.metrics if m["edges_per_s"]]
    extra["pagerank"] = {
        "iterations": res.iterations,
        "l1_delta": res.l1_delta,
        "median_iter_s": sorted(iter_walls)[len(iter_walls) // 2],
        "edges_per_sec_per_iter": sorted(eps)[len(eps) // 2],
        "converged": res.converged,
    }
    log(f"pagerank: {res.iterations} iters, {extra['pagerank']['edges_per_sec_per_iter']:.0f} edges/s/iter")

    # ---- 2b. delta (frontier-filtered) PageRank to the same 1e-6 target:
    # the scale-relevant number is TOTAL EDGES GATHERED across the
    # converged run vs the dense loop's iterations*E — the dense loop pays
    # a full O(E) gather every iteration even when <1% of ranks still move
    # (VERDICT r3 item 2; >=2x reduction is the acceptance bar).
    t0 = time.monotonic()
    res_d = pagerank_delta(spark, e, vertices=v, tol=1e-6, max_iter=1000)
    q["pagerank_delta"] = time.monotonic() - t0
    dense_gathered = res.iterations * n_e
    extra["pagerank_delta"] = {
        "rounds": res_d.iterations,
        "converged": res_d.converged,
        "edges_gathered": res_d.edges_gathered,
        "dense_edges_gathered": dense_gathered,
        "gather_reduction_x": round(dense_gathered / max(res_d.edges_gathered, 1), 2),
    }
    log(f"pagerank_delta: {res_d.iterations} rounds, gathered "
        f"{res_d.edges_gathered} vs dense {dense_gathered} "
        f"({extra['pagerank_delta']['gather_reduction_x']}x reduction)")

    # ---- 2b''. incremental recompute (the scenario warm start exists
    # for — BASELINE north_star's resumable/incremental requirement):
    # rewire a hash-chosen ~1% edge slice to shifted dst vertices, then
    # reconverge BOTH loops from the headline run's converged ranks.
    # Reported honestly: on this host the per-round job floor prices
    # delta's extra rounds above its gather savings (the crossover
    # anatomy lives in BENCH/delta_crossover.json + BENCH/BASELINE.md);
    # the ledger that scales — edges gathered — is in extra.
    batch = (
        e.filter(F.pmod(F.xxhash64("src", "dst"), F.lit(100)) == 0)
        .select(
            "src",
            F.pmod(F.col("dst") + 12345, F.lit(n_v)).alias("dst"),
            F.lit("inc").alias("rel"),
            F.lit(1.0).alias("weight"),
        )
    )
    e_inc = e.unionByName(batch).persist()
    n_e_inc = e_inc.count()
    t0 = time.monotonic()
    res_wd = pagerank(spark, e_inc, vertices=v, tol=1e-6, max_iter=iters,
                      initial_ranks=res.ranks)
    q["pagerank_warm_dense_1pct"] = time.monotonic() - t0
    t0 = time.monotonic()
    res_wl = pagerank_delta(spark, e_inc, vertices=v, tol=1e-6,
                            max_iter=1000, initial_ranks=res.ranks)
    q["pagerank_warm_delta_1pct"] = time.monotonic() - t0
    extra["pagerank_incremental"] = {
        "batch_edges": n_e_inc - n_e,
        "dense_iters": res_wd.iterations,
        "delta_rounds": res_wl.iterations,
        "dense_edges_gathered": res_wd.iterations * n_e_inc,
        "delta_edges_gathered": res_wl.edges_gathered,
        "gather_reduction_x": round(
            res_wd.iterations * n_e_inc / max(res_wl.edges_gathered, 1), 2
        ),
        "warm_vs_cold_dense_iters": round(
            res_wd.iterations / max(res.iterations, 1), 2
        ),
    }
    e_inc.unpersist()
    log(f"pagerank incremental 1pct: dense-warm {res_wd.iterations} iters "
        f"{q['pagerank_warm_dense_1pct']:.1f}s, delta-warm "
        f"{res_wl.iterations} rounds {q['pagerank_warm_delta_1pct']:.1f}s "
        f"({extra['pagerank_incremental']['gather_reduction_x']}x fewer edges)")

    # ---- 2b'. sweep-cut pricing over the converged PageRank order
    # (engine/algos/localcluster.py): measures the NEW machinery — the
    # symmetrize + degree pass, the support-wide rank window, and the two
    # O(E) broadcast rank-map passes that price every prefix — with the
    # score vector free from the headline run. (A seeded push-PPR sweep is
    # the production call; on THIS graph hub langs make any seed's support
    # corpus-wide — measured 146k/146k vertices touched at sf0.01 — so the
    # seeded variant just re-measures pagerank_delta.)
    from engine.algos.localcluster import ppr_sweep

    t0 = time.monotonic()
    sw = ppr_sweep(spark, e, seeds=[0], scores=res.ranks, top_k=2000)
    q["ppr_sweep_pagerank_order"] = time.monotonic() - t0
    extra["ppr_sweep"] = {
        "support": sw.support, "best_rank": sw.best_rank,
        "best_phi": round(sw.best_conductance, 6),
        "truncated": sw.truncated,
    }
    log(f"ppr_sweep: support {sw.support}, best k={sw.best_rank} "
        f"phi={sw.best_conductance:.4f} in {q['ppr_sweep_pagerank_order']:.1f}s")

    # ---- 2c. bucketed-edge variant (VERDICT r2 item 7): save the edges as
    # a bucketBy(src) table ONCE (the one-time cost a production deployment
    # pays at ingest), then run the loop with edges_pre_partitioned=True —
    # the scan exposes HashPartitioning(src) so prep runs with ZERO O(E)
    # exchanges (plan-asserted in test_graph_layout.py; save_edges_bucketed
    # narrows vids to int32 at save time, so the bucketed table is already
    # in the narrow layout the loop wants).
    #
    # INNER REPEATS (VERDICT r3 item 3): this host shows up to 3x
    # back-to-back variance, so a single 12-iteration sample per variant
    # can invert the bucketed-vs-plain sign. Three INTERLEAVED runs per
    # variant (plain, bucketed, plain, ...) cancel drift; medians + spreads
    # are reported so the sign is auditable.
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.sql("DROP TABLE IF EXISTS bench_edges_bucketed")
    from engine.graph import load_edges_bucketed, save_edges_bucketed
    t0 = time.monotonic()
    save_edges_bucketed(e, "bench_edges_bucketed", buckets=P)
    q["save_edges_bucketed"] = time.monotonic() - t0
    eb = load_edges_bucketed(spark, "bench_edges_bucketed")
    reps_plain, reps_bucketed = [], []
    t_variants = time.monotonic()
    for _rep in range(3):
        r_p = pagerank(spark, e, vertices=v, tol=0.0, max_iter=12)
        reps_plain.append(
            sorted(m["wall_s"] for m in r_p.metrics)[len(r_p.metrics) // 2]
        )
        r_b = pagerank(
            spark, eb, vertices=v, tol=0.0, max_iter=12,
            edges_pre_partitioned=True,
        )
        reps_bucketed.append(
            sorted(m["wall_s"] for m in r_b.metrics)[len(r_b.metrics) // 2]
        )
    q["pagerank_variants_3x12it"] = time.monotonic() - t_variants

    def _med_spread(xs):
        xs = sorted(xs)
        return {
            "median_iter_s": round(xs[len(xs) // 2], 3),
            "spread_iter_s": [round(x, 3) for x in xs],
        }

    extra["pagerank_plain_12it"] = _med_spread(reps_plain)
    extra["pagerank_bucketed"] = _med_spread(reps_bucketed)
    extra["pagerank_bucketed"]["edges_per_sec_per_iter"] = round(
        n_e / extra["pagerank_bucketed"]["median_iter_s"], 1
    )
    spark.sql("DROP TABLE IF EXISTS bench_edges_bucketed")
    log(f"pagerank 12it x3 interleaved: plain {reps_plain} "
        f"bucketed {reps_bucketed} (medians "
        f"{extra['pagerank_plain_12it']['median_iter_s']}s vs "
        f"{extra['pagerank_bucketed']['median_iter_s']}s)")

    # ---- 3. other graph algorithms
    t0 = time.monotonic()
    cc = connected_components(spark, e, v)
    cc.labels.count()
    q["connected_components"] = time.monotonic() - t0
    extra["cc_rounds"] = cc.rounds

    t0 = time.monotonic()
    lp = label_propagation(spark, e, v, max_iter=5)
    lp.labels.count()
    q["label_propagation_5it"] = time.monotonic() - t0

    t0 = time.monotonic()
    kc = core_numbers(spark, e, vertices=v)
    kc.cores.count()
    q["kcore_decomposition"] = time.monotonic() - t0
    extra["kcore_iterations"] = kc.iterations
    kc.cores.unpersist()
    log(f"kcore: {kc.iterations} h-index rounds in {q['kcore_decomposition']:.1f}s")

    # minimum spanning forest (uniform weights stress the tie-break total
    # order): O(log V) Borůvka rounds, edge table contracts monotonically
    t0 = time.monotonic()
    ms = minimum_spanning_forest(spark, e.withColumn("weight", F.lit(1.0)), vertices=v)
    n_forest = ms.edges.count()
    q["msf_boruvka"] = time.monotonic() - t0
    extra["msf"] = {"forest_edges": n_forest, "rounds": ms.rounds}
    ms.labels.unpersist()
    ms.edges.unpersist()
    log(f"msf: {n_forest} forest edges, {ms.rounds} rounds in "
        f"{q['msf_boruvka']:.1f}s")

    # topological layering of the structural DAG (repo->path->lang):
    # depth-bounded Kahn peel, edge table never rewritten
    t0 = time.monotonic()
    tp = topological_layers(spark, e, vertices=v)
    tp.layers.count()
    q["topo_layers"] = time.monotonic() - t0
    extra["topo"] = {"depth": tp.depth, "is_dag": tp.is_dag}
    tp.layers.unpersist()
    tp.unlayered.unpersist()
    log(f"topo_layers: depth {tp.depth} (dag={tp.is_dag}) in "
        f"{q['topo_layers']:.1f}s")

    # balanced k-way partitioning (Spinner LPA): the locality assignment
    # that would key the bucketed edge store at scale; reported against
    # the hash-assignment cut it starts from
    t0 = time.monotonic()
    pr_res = partition_graph(spark, e, k=8, max_rounds=6, track_cut=False)
    q["partition_graph_k8"] = time.monotonic() - t0
    base_asg = pr_res.assignment.select(
        "vid", F.pmod(F.xxhash64("vid"), F.lit(8)).cast("int").alias("part")
    )
    extra["partition"] = {
        "rounds": pr_res.rounds,
        "converged": pr_res.converged,
        "cut": pr_res.cut_history[-1],
        "hash_cut": edge_cut(e, base_asg),
        "max_load_over_avg": max(pr_res.loads.values())
        / (sum(pr_res.loads.values()) / pr_res.k),
    }
    pr_res.assignment.unpersist()
    log(f"partition k8: cut {extra['partition']['cut']} vs hash "
        f"{extra['partition']['hash_cut']} in {q['partition_graph_k8']:.1f}s")

    # Misra-Gries heavy hitters over the gather key (bounded-memory hub
    # detection): the top estimate must agree with the exact skew profile
    from engine.sketch import heavy_hitters

    t0 = time.monotonic()
    hh = heavy_hitters(e, "dst", k=64, n_shards=32)
    top = hh.orderBy(F.col("est").desc()).limit(1).collect()[0]
    q["heavy_hitters_dst"] = time.monotonic() - t0
    extra["heavy_hitters_top"] = {"dst": int(top.dst), "est": float(top.est)}
    log(f"heavy_hitters: top dst {top.dst} est {top.est:.0f} in "
        f"{q['heavy_hitters_dst']:.1f}s")

    # Bloom semi-join pruning (engine/sketch.py): a 1%-of-vertices key
    # set prunes the full edge table map-side before the exact semi-join
    # — the runtime-filter pattern across action boundaries. The row
    # times build + prune + exact join end to end at O(E) probe scale.
    from engine.sketch import bloom_build, bloom_prune, bloom_semi_join

    keys = v.filter(F.pmod(F.xxhash64("vid"), F.lit(100)) == 0).select(
        F.col("vid").alias("src")
    )
    t0 = time.monotonic()
    n_kept = bloom_semi_join(e, keys, "src", fpp=0.01, exact=True).count()
    q["bloom_semi_join_1pct"] = time.monotonic() - t0
    bf = bloom_build(keys, "src", fpp=0.01)
    n_pruned = bloom_prune(e, "src", bf).count()
    extra["bloom_semi_join"] = {
        "keys": keys.count(), "kept": n_kept, "bloom_pass": n_pruned,
        "probe_rows": n_e, "filter_bytes": bf.m_bits // 8,
        "false_positive_rows": n_pruned - n_kept,
    }
    log(f"bloom_semi_join: {n_kept} kept of {n_e} probed "
        f"({n_pruned - n_kept} bloom FPs, {bf.m_bits // 8}B filter) in "
        f"{q['bloom_semi_join_1pct']:.1f}s")

    # Butterfly counting (engine/algos/butterflies.py) on the repo->lang
    # two-mode layer (repo_path ∘ path_lang composition — repo->path
    # itself is a star forest): wedge-side selection + one self-join.
    from engine.algos.butterflies import butterflies

    rl = (
        e.filter(F.col("rel") == "repo_path")
        .select(F.col("src").alias("repo"), F.col("dst").alias("p"))
        .join(
            e.filter(F.col("rel") == "path_lang").select(
                F.col("src").alias("p"), F.col("dst").alias("lang")
            ),
            "p",
        )
        .select(F.col("repo").alias("src"), F.col("lang").alias("dst"))
        .distinct()
    )
    t0 = time.monotonic()
    bres = butterflies(spark, rl)
    q["butterflies_repo_lang"] = time.monotonic() - t0
    extra["butterflies"] = {
        "total": bres.total, "wedged_side": bres.wedged_side,
        "wedge_cost": bres.wedge_cost,
    }
    log(f"butterflies: {bres.total} (wedged {bres.wedged_side}, "
        f"{bres.wedge_cost} wedges) in {q['butterflies_repo_lang']:.1f}s")

    # Degree-preserving rewiring (engine/algos/rewire.py): the
    # configuration-model null at bench scale — 3 batch swap rounds over
    # the full structural graph (each round pairs every edge, proposes
    # E/2 swaps, commits the non-colliding ones; exact degree sequence
    # preserved throughout, invariant-tested in test_rewire.py).
    from engine.algos.rewire import double_edge_swap

    t0 = time.monotonic()
    rw = double_edge_swap(spark, e, rounds=3)
    n_rw = rw.edges.count()
    q["rewire_3rounds"] = time.monotonic() - t0
    extra["rewire"] = {
        "swaps_applied": rw.swaps_applied,
        "swaps_attempted": rw.swaps_attempted,
        "edges": n_rw,
    }
    log(f"rewire: {rw.swaps_applied}/{rw.swaps_attempted} swaps over "
        f"{n_rw} edges in {q['rewire_3rounds']:.1f}s")

    # WL structural refinement (3 rounds on the full structural graph):
    # the per-round cost is the same O(E) gather as PageRank, so this
    # benches the multiset-hash aggregation path specifically
    from engine.algos.wlhash import wl_labels

    t0 = time.monotonic()
    wl = wl_labels(spark, e, rounds=3)
    n_roles = wl.select("wl_label").distinct().count()
    q["wl_refine_3r"] = time.monotonic() - t0
    extra["wl_roles"] = n_roles
    wl.unpersist()
    log(f"wl_refine: {n_roles} distinct roles in {q['wl_refine_3r']:.1f}s")

    # temporal earliest-arrival reachability (frontier-filtered label
    # correction): timestamps synthesized as a deterministic edge hash so
    # the run is reproducible and multi-round; sources = 64 repo vertices
    t0 = time.monotonic()
    te = e.withColumn(
        "ts", (F.pmod(F.xxhash64("src", "dst"), F.lit(64))).cast("double")
    )
    tsrc = (
        v.filter(F.col("vtype") == "repo")
        .orderBy("vid")
        .limit(64)
        .select("vid", F.lit(0.0).alias("t0"))
    )
    ea = earliest_arrival(spark, te, tsrc)
    n_reached = ea.arrivals.count()
    q["temporal_earliest_arrival"] = time.monotonic() - t0
    extra["temporal"] = {
        "reached": n_reached, "rounds": ea.iterations,
        "converged": ea.converged,
    }
    ea.arrivals.unpersist()
    log(f"temporal: {n_reached} reached, {ea.iterations} rounds in "
        f"{q['temporal_earliest_arrival']:.1f}s")

    # random-walk corpus generation (DeepWalk-style training-data path):
    # one walk per vertex, 8 steps — per step one O(walks) shuffle against
    # the (v, pick)-partitioned adjacency
    t0 = time.monotonic()
    wk = random_walks(spark, e, walk_length=8, walks_per_vertex=1)
    n_walks = wk.count()
    q["random_walks_8step"] = time.monotonic() - t0
    extra["walks"] = n_walks
    wk.unpersist()
    log(f"random_walks: {n_walks} walks in {q['random_walks_8step']:.1f}s")

    # GraphSAGE 2-layer minibatch sampling from ~1% of source vertices,
    # and the skew profile of the gather key (both round-4 operators)
    from engine.algos.neighbor_sample import khop_sample
    from engine.diagnostics import skew_report
    from engine.sampling import hash_sample

    seeds = hash_sample(
        e.select(F.col("src").alias("vid")).distinct(), 0.01, ["vid"]
    )
    t0 = time.monotonic()
    n_sage = khop_sample(spark, e, seeds, fanouts=[10, 5]).count()
    q["khop_sample_2layer"] = time.monotonic() - t0
    extra["khop_sample_edges"] = n_sage
    log(f"khop_sample: {n_sage} sampled edges in {q['khop_sample_2layer']:.1f}s")

    t0 = time.monotonic()
    rep = skew_report(e, ["dst"], top_k=5)
    q["skew_report_dst"] = time.monotonic() - t0
    extra["skew"] = {
        "max_count": rep.max_count, "skew_factor": round(rep.skew_factor, 1),
        "suggested_salt": rep.suggested_salt,
    }
    log(f"skew_report: max {rep.max_count}, salt {rep.suggested_salt} in "
        f"{q['skew_report_dst']:.1f}s")

    # ---- 3b. incremental fold vs full rebuild (engine/incremental.py):
    # fold a ~1% batch into maintained state. The number to compare is
    # incremental_fold vs derive_structural (the full-rebuild cost on the
    # same corpus) — the fold never rescans source content, only merges
    # the batch's edges and extends vids.
    bucket = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(100))
    base_src, batch_src = src.filter(bucket > 0), src.filter(bucket == 0)
    iv, ie, ine, im = INC.initial_state(base_src, include_cooccur=False)
    ine.count(); iv.count()  # materialize the maintained state untimed
    # (initial_state persists name_edges/vertices itself)
    t0 = time.monotonic()
    fv, fe, fne, fm = INC.update_graph(
        iv, ine, im, batch_src, include_cooccur=False
    )
    n_batch, n_fold_edges = batch_src.count(), fe.count()
    q["incremental_fold_1pct"] = time.monotonic() - t0
    extra["incremental"] = {
        "batch_rows": n_batch,
        "edges_after_fold": n_fold_edges,
        "full_rebuild_s": round(q["derive_structural"], 3),
    }
    for df in (ine, iv, fne, fv):
        df.unpersist()
    log(f"incremental_fold_1pct: {n_batch} rows folded in "
        f"{q['incremental_fold_1pct']:.1f}s (full rebuild "
        f"{q['derive_structural']:.1f}s)")

    src.unpersist()
    v.unpersist()
    e.unpersist()

    # ---- 4. full derivation with content hashing (Arrow UDF path)
    t0 = time.monotonic()
    small = source_files(spark, min(rows, 200_000), max(50, repos // 10)).persist()
    small.count()
    viol = hash_invariant_violations(small)
    v2, e2 = build_graph(small, include_cooccur=True, log_dropped=False)
    e2 = e2.persist()
    e2.count()
    q["derive_full_hash_cooccur"] = time.monotonic() - t0
    extra["hash_violations"] = viol
    small.unpersist()
    log(f"derive_full: {q['derive_full_hash_cooccur']:.1f}s, violations={viol}")

    # triangles need the co-occurrence edges: the structural graph alone is
    # tripartite (repo->path->lang) and has none by construction.
    t0 = time.monotonic()
    tc = triangle_count(spark, e2)
    q["triangle_count"] = time.monotonic() - t0
    extra["triangles"] = tc
    log(f"triangles: {tc} in {q['triangle_count']:.1f}s")

    # link-prediction scores over ALL graph edges as the candidate set
    # (the production shape: score known/candidate pairs, never enumerate
    # all-pairs at scale)
    t0 = time.monotonic()
    cand = e2.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    n_scored = link_scores(spark, e2, pairs=cand).count()
    q["link_scores_candidates"] = time.monotonic() - t0
    extra["link_pairs_scored"] = n_scored
    log(f"link_scores: {n_scored} pairs in {q['link_scores_candidates']:.1f}s")

    # pivot-sampled betweenness: 4 pivots, all in one layered BFS + one
    # descending accumulation (job count scales with depth, not pivots).
    # Pivots are REPO vertices so the forward phase runs the full
    # repo->path->lang->cooccur depth — r3's lowest-vid pivots happened to
    # reach only one layer, timing setup instead of the layered loop
    # (VERDICT r3 item 8).
    t0 = time.monotonic()
    piv = (
        v2.filter(F.col("vtype") == "repo")
        .orderBy("vid").limit(4).select("vid")
    )
    bw = betweenness(spark, e2, pivots=piv)
    bw.scores.count()
    q["betweenness_4pivots"] = time.monotonic() - t0
    extra["betweenness_depth"] = bw.max_depth
    bw.scores.unpersist()
    log(f"betweenness: depth {bw.max_depth} in {q['betweenness_4pivots']:.1f}s")

    # HyperBall neighborhood function (directed balls; the structural
    # graph is a depth-2 DAG so this converges in a few rounds — the cost
    # driver is the O(E) counter pull + 64-register merge per round)
    t0 = time.monotonic()
    nb = neighborhood_function(spark, e2, p=6)
    nb.balls.count()
    q["neighborhood_hyperball"] = time.monotonic() - t0
    extra["hyperball"] = {
        "iterations": nb.iterations,
        "converged": nb.converged,
        "n_final": round(nb.history[-1], 1),
    }
    nb.balls.unpersist()

    # ALT landmark distance oracle (engine/algos/landmarks.py) on the
    # repo<->repo co-occurrence subgraph — the graph where point-to-point
    # distances mean something (the structural graph is a 2-layer DAG
    # whose landmark bounds are vacuously null). Build = two
    # multi-landmark Bellman-Ford fixpoints (all 4 landmarks relax in one
    # composite-key loop); the 10k-pair batch is then answered with joins
    # only — no per-query traversal.
    from engine.algos.landmarks import build_distance_oracle, estimate_distance
    from engine.graph import symmetrize

    co = symmetrize(e2.filter(F.col("rel") == "cooccur")).localCheckpoint(
        eager=True
    )
    t0 = time.monotonic()
    orc = build_distance_oracle(spark, co, n_landmarks=4, weighted=False)
    q["alt_oracle_build_4lm"] = time.monotonic() - t0
    t0 = time.monotonic()
    ids = co.select(F.col("src").alias("vid")).distinct().orderBy("vid")
    qpairs = (
        ids.select(F.col("vid").alias("src")).limit(100)
        .crossJoin(ids.select(F.col("vid").alias("dst")).limit(100))
    )
    n_bounded = (
        estimate_distance(orc, qpairs).filter("upper IS NOT NULL").count()
    )
    q["alt_query_10k_pairs"] = time.monotonic() - t0
    extra["alt"] = {"iterations": orc.iterations, "bounded_pairs": n_bounded}
    orc.fwd.unpersist()
    orc.bwd.unpersist()

    # exact diameter (iFUB) of an R-MAT largest component (the cooccur
    # subgraph's components are tiny by construction — its explode cap
    # bounds them; R-MAT gives a real small-world giant component).
    # bfs_count is the honest cost metric: iFUB's claim is bfs_count << V.
    from engine.algos.diameter import diameter as exact_diameter
    from engine.datagen import rmat_edges

    rm = rmat_edges(spark, 15, 120_000, seed=9).localCheckpoint(eager=True)
    t0 = time.monotonic()
    cc_rm = connected_components(spark, rm)
    big = (
        cc_rm.labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("label").asc())
        .limit(1)
        .collect()[0]
    )
    member = cc_rm.labels.filter(
        F.col("label") == big.label
    ).select(F.col("vid").alias("src"))
    rm_big = rm.join(member, "src")
    dia = exact_diameter(spark, rm_big, max_bfs_batch=512)
    q["diameter_ifub_rmat"] = time.monotonic() - t0
    extra["diameter"] = {
        "component_size": int(big.n),
        "diameter": dia.diameter,
        "bfs_count": dia.bfs_count,
        "levels_processed": dia.levels_processed,
    }
    cc_rm.labels.unpersist()
    rm.unpersist()
    log(f"diameter: {dia.diameter} ({dia.bfs_count} BFS over "
        f"{big.n}-vertex component) in {q['diameter_ifub_rmat']:.1f}s")

    co.unpersist()
    e2.unpersist()
    log(f"hyperball: {nb.iterations} rounds in {q['neighborhood_hyperball']:.1f}s")
    log(f"alt: build {q['alt_oracle_build_4lm']:.1f}s, 10k-pair bounds in "
        f"{q['alt_query_10k_pairs']:.1f}s ({n_bounded} upper-bounded)")

    # ---- 5. driver-table slice at sf_dir
    def timed(name, fn):
        t = time.monotonic()
        fn()
        q[name] = time.monotonic() - t
        log(f"{name}: {q[name]:.1f}s")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    timed(
        "q1_pricing_summary",
        lambda: li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "q2_join_agg",
        lambda: li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity"), F.count(F.lit(1)))
        .collect(),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()
    timed("q3_minhash_dedup", lambda: D.minhash_candidates(docs, k=16, bands=4).count())

    # Exact prefix-filtered Jaccard join (engine/ssjoin.py) on the same
    # shingle family: the sketch-free ground truth. The extra column
    # records measured MinHash recall at the 0.6 threshold — the number
    # the LSH knobs (k, bands) are trading wall-clock against.
    from engine.ssjoin import jaccard_join

    t0 = time.monotonic()
    exact_pairs = {
        (r.a, r.b)
        for r in jaccard_join(docs, 0.6).select("a", "b").collect()
    }
    q["ssjoin_exact_06"] = time.monotonic() - t0
    cand = D.minhash_candidates(docs, k=16, bands=4)
    mh_pairs = {
        (r.a, r.b)
        for r in D.ngram_jaccard_pairs(docs, cand)
        .filter(F.col("jaccard") >= 0.6)
        .select("a", "b")
        .collect()
    }
    extra["ssjoin"] = {
        "exact_pairs": len(exact_pairs),
        "minhash_verified_pairs": len(mh_pairs),
        "minhash_recall": round(
            len(mh_pairs & exact_pairs) / max(len(exact_pairs), 1), 4
        ),
    }
    log(f"ssjoin_exact_06: {len(exact_pairs)} exact pairs in "
        f"{q['ssjoin_exact_06']:.1f}s; minhash recall "
        f"{extra['ssjoin']['minhash_recall']}")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()
    timed(
        "q4_ann_topk",
        lambda: S.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).count(),
    )
    timed(
        "q5_docs_graph",
        lambda: build_graph(documents_as_source(spark, sf_dir), log_dropped=False)[1].count(),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    timed(
        "q6_range_join",
        lambda: R.range_join(
            ev.filter(F.col("event_type") == "error"),
            ev.filter(F.col("event_type") == "click"),
            on="ts", by=["user_id"],
            lower_seconds=-3600.0, upper_seconds=0.0, right_cols=["event_id"],
        ).count(),
    )
    # q7: near-dup detection with planted duplicates (scaled copies keep
    # cosine == 1 and identical SRP signs, so recall of the planted pairs
    # is 100% by construction — measured so). Bucketing sized for the
    # corpus: 16-bit band keys (64 planes / 4 bands) spread the clustered
    # embeddings below the cap. The driver's d6 correctness check runs the
    # sf0.01-sized config.
    pert = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(pert)
    timed(
        "q7_embed_neardup",
        lambda: S.embedding_neardup(
            both, threshold=0.98, n_planes=64, bands=4, bucket_cap=256
        ).count(),
    )

    # ---- 6. round-4 pipeline operators over the docs table (cheap rows;
    # heavy ops like Louvain are measured solo in BENCH/BASELINE.md)
    from engine.packing import pack_sequences
    from engine.text import token_counts

    t0 = time.monotonic()
    packed = pack_sequences(
        token_counts(docs), 2048, "n_tokens", ["doc_id"], streams=cpus
    )
    n_pack = packed.select("batch_id").distinct().count()
    q["pack_sequences_2048"] = time.monotonic() - t0
    extra["packed_batches"] = n_pack
    log(f"pack_sequences: {n_pack} batches in {q['pack_sequences_2048']:.1f}s")

    # n-gram LM: train a trigram stupid-backoff model on the even docs,
    # perplexity-score the whole table (held-out odd docs exercise the
    # backoff/OOV paths at real rates)
    from engine import lm as LMOD

    t0 = time.monotonic()
    lm_model = LMOD.train_ngram_lm(
        docs.filter(F.col("doc_id") % 2 == 0), n=3, min_count=2
    )
    q["lm_train_3gram"] = time.monotonic() - t0
    t0 = time.monotonic()
    scored = LMOD.score_perplexity(docs, lm_model)
    srow = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_approx(ppl, 0.5)").alias("p50"),
    ).collect()[0]
    q["lm_score_ppl"] = time.monotonic() - t0
    extra["lm"] = {
        "vocab": lm_model.vocab_size,
        "total_tokens": lm_model.total_tokens,
        "docs_scored": int(srow.n),
        "median_ppl": round(float(srow.p50), 2),
    }
    log(
        f"lm: train {q['lm_train_3gram']:.1f}s "
        f"(V={lm_model.vocab_size}), score {q['lm_score_ppl']:.1f}s "
        f"(median ppl {srow.p50:.1f})"
    )

    # normalization + C4 line cleaning: the every-byte-once corpus pass
    from engine.text import clean_lines, normalize_text

    t0 = time.monotonic()
    n_clean = clean_lines(
        normalize_text(docs, unicode_form=None), require_terminal=False
    ).count()
    q["normalize_clean_lines"] = time.monotonic() - t0
    extra["clean_docs_kept"] = n_clean
    log(f"normalize+clean_lines: {n_clean} docs in {q['normalize_clean_lines']:.1f}s")

    # feature smoothing: 2 rounds of SGC-mean over the docs graph with
    # 8-dim hash-synthesized features (graph build excluded from the row)
    from engine.algos.featprop import smooth_features

    fv, fe = build_graph(documents_as_source(spark, sf_dir), log_dropped=False)
    fe = fe.persist()
    feats = fv.select(
        "vid",
        F.array(
            *[
                (
                    F.pmod(F.xxhash64("vid", F.lit(i)), F.lit(1000))
                    / F.lit(1000.0)
                )
                for i in range(8)
            ]
        ).alias("x"),
    ).persist()
    n_e, n_f = fe.count(), feats.count()
    t0 = time.monotonic()
    n_sm = smooth_features(spark, fe, feats, rounds=2, dim=8).count()
    q["feature_smoothing_2r"] = time.monotonic() - t0
    extra["feature_smoothing"] = {"vertices": n_sm, "edges": n_e}
    fe.unpersist()
    feats.unpersist()
    log(
        f"feature_smoothing: {n_sm} vertices x 8 dims, 2 rounds over "
        f"{n_e} edges in {q['feature_smoothing_2r']:.1f}s"
    )

    total = time.monotonic() - t_all
    out = {
        "metric": "pagerank_edges_per_sec_per_iteration",
        "value": round(extra["pagerank"]["edges_per_sec_per_iter"], 1),
        "unit": "edges/sec",
        "queries": {k: round(vv, 3) for k, vv in q.items()},
        "sf": sf_dir,
        "cpus": cpus,
        "bench_rows": rows,
        "total_wall_sec": round(total, 1),
        "detail": extra,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
