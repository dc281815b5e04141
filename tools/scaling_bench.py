"""N-vs-4N scaling evidence (BASELINE.json: efficiency >= 0.8).

No real cluster exists in this sandbox (SURVEY.md §0), so the two-cluster
criterion is evidenced the way the driver prescribed: the IDENTICAL job —
same artifact, same deterministic input — at two parallelism levels,
``local[8]`` vs ``local[32]``, each launched via

    spark-submit --master local[P] --py-files engine.zip tools/scaling_bench.py --run P

which is literally the cluster launch form (swap ``--master``). Efficiency
is computed on the steady-state PageRank iteration wall (the metric is
per-iteration throughput): eff = (T_8 / T_32) / 4.

Orchestrator mode (no args): zips engine/, runs both submits, writes
BENCH/BASELINE.md + BENCH/scaling.json.

Run mode (--run P): executes datagen -> derive -> PageRank(iters) and
prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "6000000"))
ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "10"))
REPOS = max(100, ROWS // 400)


def run_one(parallelism: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from engine.datagen import source_files
    from engine.derive import build_graph
    from engine.session import get_spark
    from engine.algos.pagerank import pagerank

    spark = get_spark(parallelism, app_name=f"scaling-p{parallelism}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    src = source_files(spark, ROWS, REPOS, with_content=False).persist()
    src.count()
    v, e = build_graph(src, include_cooccur=False)
    v = v.persist()
    e = e.persist()
    n_v, n_e = v.count(), e.count()
    t_derive = time.monotonic() - t0

    t0 = time.monotonic()
    res = pagerank(spark, e, vertices=v, tol=0.0, max_iter=ITERS)
    t_pr = time.monotonic() - t0
    walls = [m["wall_s"] for m in res.metrics]
    # steady state: drop the first two iterations (cache + JIT warm-up)
    steady = sorted(walls[2:])
    med = steady[len(steady) // 2]
    checksum = res.ranks.agg(F.sum(F.col("value") * F.col("vid"))).collect()[0][0]
    out = {
        "parallelism": parallelism,
        "rows": ROWS,
        "vertices": n_v,
        "edges": n_e,
        "iters": ITERS,
        "derive_s": round(t_derive, 2),
        "pagerank_s": round(t_pr, 2),
        "iter_walls": [round(x, 2) for x in walls],
        "median_iter_s": round(med, 3),
        "edges_per_sec_per_iter": round(n_e / med, 1),
        "rank_checksum": checksum,
    }
    spark.stop()
    print("SCALING_RESULT " + json.dumps(out), flush=True)


def build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "engine")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def submit(parallelism: int, zip_path: str) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or "/usr/bin/pyspark"), "spark-submit"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PYSPARK_GATEWAY", "SPARK_CONNECT"))
    }
    cmd = [
        spark_submit,
        "--master", f"local[{parallelism}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "16g"),
        # must be on the submit line: the driver JVM exists before the
        # in-script session builder could apply it
        "--conf", "spark.driver.extraJavaOptions="
        + os.environ.get(
            "SPARK_GC_OPTS",
            "-XX:+UseParallelGC -Xms%s -XX:+AlwaysPreTouch"
            % os.environ.get("SPARK_DRIVER_MEM", "16g"),
        ),
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_bench.py"),
        "--run", str(parallelism),
    ]
    print("+", " ".join(cmd), file=sys.stderr, flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(
        f"no result from p={parallelism}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def orchestrate() -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    zip_path = os.path.join(REPO, "BENCH", "engine.zip")
    build_zip(zip_path)
    r32 = submit(32, zip_path)
    r8 = submit(8, zip_path)
    eff = (r8["median_iter_s"] / r32["median_iter_s"]) / 4.0
    agree = abs(r8["rank_checksum"] - r32["rank_checksum"]) < 1e-9 * max(
        1.0, abs(r32["rank_checksum"])
    )
    result = {
        "rows": ROWS,
        "edges": r32["edges"],
        "vertices": r32["vertices"],
        "iters": ITERS,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(r8["median_iter_s"] / r32["median_iter_s"], 3),
        "scaling_efficiency": round(eff, 3),
        "results_identical": agree,
        "launch_form": "spark-submit --master local[P] --py-files engine.zip tools/scaling_bench.py --run P",
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    write_baseline_md(result)
    print(json.dumps(result, indent=2))


def write_baseline_md(r: dict) -> None:
    md = f"""# BENCH/BASELINE.md — measured numbers

Generated by `tools/scaling_bench.py` (the same artifact a cluster run
would use: `{r['launch_form']}`).

## PageRank N-vs-4N scaling (the BASELINE.json criterion)

Identical job, identical deterministic input ({r['rows']:,} source rows ->
{r['edges']:,} edges, {r['vertices']:,} vertices), {r['iters']} power
iterations, steady-state per-iteration wall (first iteration dropped as
cache warm-up):

| parallelism | median iter (s) | edges/sec/iteration | derive (s) |
| --- | --- | --- | --- |
| local[8]  (N)  | {r['local8']['median_iter_s']} | {r['local8']['edges_per_sec_per_iter']:,} | {r['local8']['derive_s']} |
| local[32] (4N) | {r['local32']['median_iter_s']} | {r['local32']['edges_per_sec_per_iter']:,} | {r['local32']['derive_s']} |

- speedup 8->32: **{r['speedup_8_to_32']}x** (ideal 4x)
- **scaling efficiency = (T_8 / T_32) / 4 = {r['scaling_efficiency']}** (target >= 0.8)
- per-vertex results identical across parallelisms: {r['results_identical']}
  (rank checksum agreement < 1e-9 relative; pytest t5 additionally asserts
  allclose 1e-12 per-vertex)

## Reference numbers

The reference (vz-risk/Verum) published no benchmarks (single-threaded
NetworkX toolkit, SURVEY.md §5.1/§6); correctness parity vs its scorer
semantics (networkx PageRank, allclose 1e-6; exact CC/LPA/triangles) is
enforced by `python -m pytest -x -q` (tests/test_pagerank.py etc.).

Raw data: `BENCH/scaling.json`. Per-round operator timings: `BENCH_r{{N}}.json`
(driver-run `bench.py`).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=None)
    args = ap.parse_args()
    if args.run:
        run_one(args.run)
    else:
        orchestrate()
