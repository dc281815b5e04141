"""Isolated per-operator benchmarks (guide §1.4) — NOT the driver bench.

bench.py is frozen for measurement; this harness exists to iterate on
single operators: it builds the same synthetic structural graph bench.py
uses, times a selected subset of operators solo, and (optionally) writes
``.explain("formatted")`` plans for the round's plan-diff deliverables.

Usage:
    python bench_extra.py --ops rewire,partition --rows 2000000
    python bench_extra.py --ops pagerank12 --rows 500000 --repeat 3

Prints one JSON object; each op is timed with time.monotonic around the
same action shape bench.py uses (counts / scalar collects — the loops
are action-driven, so a noop sink would add nothing for them; noop is
used for the plain dataframe ops).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from engine.datagen import source_files  # noqa: E402
from engine.derive import build_graph  # noqa: E402
from engine.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", required=True)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir", default=None)
    args = ap.parse_args()
    ops = args.ops.split(",")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cpus, app_name="verum-spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    repos = max(100, args.rows // 400)

    out: dict[str, object] = {"rows": args.rows, "cpus": cpus}
    t0 = time.monotonic()
    src = source_files(spark, args.rows, repos, with_content=False).persist()
    src.count()
    v, e = build_graph(src, include_cooccur=False)
    v = v.persist()
    e = e.persist()
    n_v, n_e = v.count(), e.count()
    out["setup_s"] = round(time.monotonic() - t0, 2)
    out["vertices"] = n_v
    out["edges"] = n_e

    def timed(name, fn):
        samples = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t = time.monotonic()
            extra = fn()
            samples.append(round(time.monotonic() - t, 3))
            spark.sparkContext.setJobDescription(None)
            if extra:
                out[f"{name}_detail"] = extra
        out[name] = samples
        print(f"{name}: {samples}", file=sys.stderr, flush=True)

    def explain_to(name, df):
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            p = os.path.join(args.explain_dir, name)
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))

    for op in ops:
        if op == "pagerank12":
            from engine.algos.pagerank import pagerank

            def run():
                r = pagerank(spark, e, vertices=v, tol=0.0, max_iter=12)
                ws = sorted(m["wall_s"] for m in r.metrics)
                return {"median_iter_s": round(ws[len(ws) // 2], 3),
                        "iter_walls": [round(w, 3) for w in ws]}
            timed("pagerank12", run)
        elif op == "pagerank_full":
            from engine.algos.pagerank import pagerank

            def run():
                r = pagerank(spark, e, vertices=v, tol=1e-6, max_iter=150)
                ws = sorted(m["wall_s"] for m in r.metrics)
                return {"iters": r.iterations,
                        "median_iter_s": round(ws[len(ws) // 2], 3)}
            timed("pagerank_full", run)
        elif op == "pagerank_delta":
            from engine.algos.pagerank import pagerank_delta

            def run():
                r = pagerank_delta(spark, e, vertices=v, tol=1e-6,
                                   max_iter=1000)
                return {"rounds": r.iterations,
                        "edges_gathered": r.edges_gathered}
            timed("pagerank_delta", run)
        elif op == "rewire":
            from engine.algos.rewire import double_edge_swap

            def run():
                r = double_edge_swap(spark, e, rounds=3)
                n = r.edges.count()
                return {"swaps": r.swaps_applied, "edges": n}
            timed("rewire3", run)
        elif op == "partition":
            from engine.algos.partition import partition_graph

            def run():
                r = partition_graph(spark, e, k=8, max_rounds=6,
                                    track_cut=False)
                cut = r.cut_history[-1]
                r.assignment.unpersist()
                return {"cut": cut, "rounds": r.rounds}
            timed("partition6", run)
        elif op == "cc":
            from engine.algos.cc import connected_components

            def run():
                r = connected_components(spark, e, v)
                r.labels.count()
                return {"rounds": r.rounds}
            timed("cc", run)
        elif op == "kcore":
            from engine.algos.kcore import core_numbers

            def run():
                r = core_numbers(spark, e, vertices=v)
                r.cores.count()
                r.cores.unpersist()
                return {"iters": r.iterations}
            timed("kcore", run)
        elif op == "lpa":
            from engine.algos.lpa import label_propagation

            def run():
                r = label_propagation(spark, e, v, max_iter=5)
                r.labels.count()
                return {"iters": r.iterations}
            timed("lpa5", run)
        elif op == "msf":
            from engine.algos.msf import minimum_spanning_forest

            def run():
                r = minimum_spanning_forest(
                    spark, e.withColumn("weight", F.lit(1.0)), vertices=v)
                n = r.edges.count()
                r.labels.unpersist()
                r.edges.unpersist()
                return {"forest": n, "rounds": r.rounds}
            timed("msf", run)
        elif op == "topo":
            from engine.algos.toposort import topological_layers

            def run():
                r = topological_layers(spark, e, vertices=v)
                r.layers.count()
                r.layers.unpersist()
                r.unlayered.unpersist()
                return {"depth": r.depth}
            timed("topo", run)
        elif op == "wl":
            from engine.algos.wlhash import wl_labels

            def run():
                w = wl_labels(spark, e, rounds=3)
                n = w.select("wl_label").distinct().count()
                w.unpersist()
                return {"roles": n}
            timed("wl3", run)
        elif op == "hyperball":
            from engine.algos.neighborhood import neighborhood_function

            def run():
                r = neighborhood_function(spark, e, p=6)
                r.balls.count()
                r.balls.unpersist()
                return {"iters": r.iterations}
            timed("hyperball", run)
        elif op == "ppr_sweep":
            from engine.algos.localcluster import ppr_sweep
            from engine.algos.pagerank import pagerank

            pr = pagerank(spark, e, vertices=v, tol=1e-6, max_iter=150)

            def run():
                sw = ppr_sweep(spark, e, seeds=[0], scores=pr.ranks,
                               top_k=2000)
                return {"support": sw.support, "best": sw.best_rank}
            timed("ppr_sweep", run)
        elif op == "temporal":
            from engine.algos.temporal import earliest_arrival

            te = e.withColumn(
                "ts",
                (F.pmod(F.xxhash64("src", "dst"), F.lit(64))).cast("double"),
            )
            tsrc = (
                v.filter(F.col("vtype") == "repo").orderBy("vid").limit(64)
                .select("vid", F.lit(0.0).alias("t0"))
            )

            def run():
                r = earliest_arrival(spark, te, tsrc)
                n = r.arrivals.count()
                r.arrivals.unpersist()
                return {"reached": n, "rounds": r.iterations}
            timed("temporal", run)
        elif op == "walks":
            from engine.algos.walks import random_walks

            def run():
                wk = random_walks(spark, e, walk_length=8,
                                  walks_per_vertex=1)
                n = wk.count()
                wk.unpersist()
                return {"walks": n}
            timed("walks", run)
        elif op == "derive":
            def run():
                v2, e2 = build_graph(src, include_cooccur=False)
                n = e2.count()
                v2.unpersist()
                e2.unpersist()
                return {"edges": n}
            timed("derive", run)
        elif op == "diameter":
            from engine.algos.cc import connected_components
            from engine.algos.diameter import diameter as exact_diameter
            from engine.datagen import rmat_edges

            rm = rmat_edges(spark, 15, 120_000, seed=9).localCheckpoint(
                eager=True)

            def run():
                cc_rm = connected_components(spark, rm)
                big = (
                    cc_rm.labels.groupBy("label")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .orderBy(F.col("n").desc(), F.col("label").asc())
                    .limit(1).collect()[0]
                )
                member = cc_rm.labels.filter(
                    F.col("label") == big.label
                ).select(F.col("vid").alias("src"))
                rm_big = rm.join(member, "src")
                d = exact_diameter(spark, rm_big, max_bfs_batch=512)
                cc_rm.labels.unpersist()
                return {"diameter": d.diameter, "bfs": d.bfs_count}
            timed("diameter", run)
        else:
            print(f"unknown op: {op}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
