"""Delta-vs-dense PageRank crossover measurement (VERDICT r4 item 4).

Round 4 measured `pagerank_delta` (frontier-filtered / push PageRank,
engine/algos/pagerank.py) gathering 2.11x fewer edge rows than the dense
loop yet losing on wall-clock at sf0.1 local[32]: its long tail of tiny
rounds was priced at the fixed per-job floor (148 rounds vs 71 dense
iterations). Round 5 added the adaptive tail schedule (tail_c): early
rounds keep the aggressive filter where E-sized gathers are the real
cost, tail rounds push near-dense fractions so the job-floor-priced tail
shrinks ~3x.

This tool documents the crossover honestly: at each graph size it runs,
interleaved in ONE session (shared weather),

  - dense   `pagerank`        to the 1e-6 fixpoint,
  - delta   `pagerank_delta`  (adaptive tail, the default) to the same
                              fixpoint tolerance,
  - flat    `pagerank_delta(tail_c=None)` — the pre-r5 schedule — as the
                              ablation, small sizes only by default,

and emits walls / rounds / edges-gathered per variant plus the
delta:dense wall ratio. The claim the curve supports: gather reduction
is real at every size (it is counted, not timed); the WALL win appears
once per-round gathers dominate the per-job floor — i.e. it grows with
E, which is the 100 TB direction. The fixpoint itself is
schedule-invariant (tests/test_pagerank_delta.py asserts 1e-9 equality
against the dense ranks for several (frontier_c, tail_c) choices).

Usage:
    python tools/delta_crossover.py --rows 2000000,8000000,24000000
Writes BENCH/delta_crossover.json and prints one JSON line per size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
TOL = 1e-6


def graph_dir(rows: int) -> str:
    # Same path convention as tools/scaling_bench.py so the 24M-row graph
    # is built once and shared between the two campaigns.
    return f"{_SCRATCH}/verum_scaling_graph_{rows}"


def build(rows: int) -> str:
    from engine.datagen import source_files
    from engine.derive import build_graph as derive
    from engine.session import get_spark

    gd = graph_dir(rows)
    if os.path.exists(os.path.join(gd, "_done")):
        return gd
    spark = get_spark(os.cpu_count() or 32, app_name=f"xover-build-{rows}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    src = source_files(spark, rows, max(100, rows // 400), with_content=False)
    v, e = derive(src, include_cooccur=False)
    e.write.mode("overwrite").parquet(os.path.join(gd, "edges"))
    v.write.mode("overwrite").parquet(os.path.join(gd, "vertices"))
    with open(os.path.join(gd, "_done"), "w") as fh:
        json.dump({"rows": rows, "build_s": round(time.monotonic() - t0, 1)}, fh)
    spark.stop()
    print(f"graph({rows}) built in {time.monotonic()-t0:.1f}s -> {gd}",
          file=sys.stderr, flush=True)
    return gd


def run_size(rows: int, with_flat: bool) -> dict:
    from pyspark.sql import functions as F

    from engine.algos.pagerank import pagerank, pagerank_delta
    from engine.session import get_spark

    gd = build(rows)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = get_spark(cpus, app_name=f"xover-{rows}")
    spark.sparkContext.setLogLevel("ERROR")
    v = spark.read.parquet(os.path.join(gd, "vertices")).persist()
    e = spark.read.parquet(os.path.join(gd, "edges")).persist()
    n_v, n_e = v.count(), e.count()

    def checksum(res) -> float:
        return res.ranks.agg(F.sum(F.col("value") * F.col("vid"))).collect()[0][0]

    out: dict = {"rows": rows, "vertices": n_v, "edges": n_e, "tol": TOL}

    variants: list[tuple[str, dict]] = [("dense", {}), ("delta", {})]
    if with_flat:
        variants.append(("delta_flat", {"tail_c": None}))
    # One JVM/cache warm-up pass (short, discarded) so the first timed
    # variant isn't the one paying JIT + shuffle-service spin-up.
    pagerank(spark, e, vertices=v, tol=0.0, max_iter=3)

    for name, kw in variants:
        t0 = time.monotonic()
        if name == "dense":
            res = pagerank(spark, e, vertices=v, tol=TOL, max_iter=1000)
            gathered = res.iterations * n_e
            rounds = res.iterations
        else:
            res = pagerank_delta(spark, e, vertices=v, tol=TOL,
                                 max_iter=4000, **kw)
            gathered = res.edges_gathered
            rounds = res.iterations
        wall = time.monotonic() - t0
        out[name] = {
            "wall_s": round(wall, 1),
            "rounds": rounds,
            "edges_gathered": int(gathered),
            "converged": res.converged,
            "rank_checksum": checksum(res),
        }
        print(f"  rows={rows} {name}: {wall:.1f}s, {rounds} rounds, "
              f"{gathered:,} edge rows gathered", file=sys.stderr, flush=True)

    d, dl = out["dense"], out["delta"]
    out["delta_over_dense_wall"] = round(dl["wall_s"] / d["wall_s"], 3)
    out["gather_reduction_x"] = round(d["edges_gathered"] / max(dl["edges_gathered"], 1), 2)
    out["checksums_agree"] = abs(d["rank_checksum"] - dl["rank_checksum"]) < (
        1e-6 * max(1.0, abs(d["rank_checksum"]))
    )
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="2000000,8000000,24000000")
    ap.add_argument("--flat-upto", type=int, default=2_000_000,
                    help="run the tail_c=None ablation at sizes <= this")
    args = ap.parse_args()
    sizes = [int(x) for x in args.rows.split(",") if x]
    results = []
    for rows in sizes:
        r = run_size(rows, with_flat=rows <= args.flat_upto)
        results.append(r)
        print(json.dumps(r), flush=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "delta_crossover.json"), "w") as fh:
        json.dump({"tol": TOL, "sizes": results}, fh, indent=2)


if __name__ == "__main__":
    main()
