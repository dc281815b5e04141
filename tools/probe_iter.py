"""Probe: fixed-vs-variable per-iteration cost for the PageRank loop.

Runs the identical loop at several parallelisms on a cached graph and
prints median steady-state iteration wall + JVM CPU + GC time, so fixed
overhead, GC pathology, and O(E/P) work can be separated. Diagnosis tool,
not part of the harness.

Usage: [taskset -c 0-P-1] python tools/probe_iter.py P ROWS [ITERS]
Env: PROBE_GC_OPTS overrides SPARK_GC_OPTS passthrough.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402
from engine.algos.pagerank import pagerank  # noqa: E402


def _jvm_cpu_seconds() -> tuple[float, float]:
    """(utime, stime) summed over child java processes (ticks -> sec)."""
    import glob
    me = os.getpid()
    tck = os.sysconf("SC_CLK_TCK")
    ut = st = 0.0
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(stat).read().rsplit(") ", 1)
            comm = parts[0].split("(", 1)[1]
            rest = parts[1].split()
            ppid = int(rest[1])
            if "java" in comm and ppid == me:
                ut += int(rest[11]) / tck
                st += int(rest[12]) / tck
        except (OSError, IndexError, ValueError):
            continue
    return ut, st


def _gc_ms(spark) -> dict:
    out = {}
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        b = beans.get(i)
        out[b.getName()] = {"count": b.getCollectionCount(), "ms": b.getCollectionTime()}
    return out


def _graph(spark, rows: int):
    """Build once, cache to /tmp parquet; later probes just read."""
    base = f"/tmp/probe_graph_{rows}"
    if not os.path.exists(base + "/_done"):
        from engine.datagen import source_files
        from engine.derive import build_graph
        src = source_files(spark, rows, max(100, rows // 400), with_content=False)
        v, e = build_graph(src, include_cooccur=False)
        e.write.mode("overwrite").parquet(base + "/edges")
        v.write.mode("overwrite").parquet(base + "/vertices")
        open(base + "/_done", "w").write("ok")
    return (
        spark.read.parquet(base + "/vertices"),
        spark.read.parquet(base + "/edges"),
    )


def main() -> None:
    par = int(sys.argv[1])
    rows = int(sys.argv[2])
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    if os.environ.get("PROBE_GC_OPTS"):
        os.environ["SPARK_GC_OPTS"] = os.environ["PROBE_GC_OPTS"]
    shuf = os.environ.get("PROBE_SHUF")
    extra = {}
    for kv in os.environ.get("PROBE_CONF", "").split(";"):
        if "=" in kv:
            k, _, vv = kv.partition("=")
            extra[k.strip()] = vv.strip()
    spark = get_spark(
        par,
        app_name=f"probe-p{par}-r{rows}",
        shuffle_partitions=int(shuf) if shuf else None,
        extra=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    v, e = _graph(spark, rows)
    v = v.persist(); e = e.persist()
    n_v, n_e = v.count(), e.count()

    t0 = time.monotonic()
    ut0, st0 = _jvm_cpu_seconds()
    gc0 = _gc_ms(spark)
    res = pagerank(spark, e, vertices=v, tol=0.0, max_iter=iters)
    wall = time.monotonic() - t0
    ut1, st1 = _jvm_cpu_seconds()
    cpu = (ut1 + st1) - (ut0 + st0)
    sys_s = st1 - st0
    gc1 = _gc_ms(spark)
    gc_ms = sum(g["ms"] for g in gc1.values()) - sum(g["ms"] for g in gc0.values())
    gc_n = sum(g["count"] for g in gc1.values()) - sum(g["count"] for g in gc0.values())
    walls = [round(m["wall_s"], 3) for m in res.metrics]
    steady = sorted(walls[2:])
    med = steady[len(steady) // 2]
    print("PROBE " + json.dumps({
        "par": par, "rows": rows, "vertices": n_v, "edges": n_e,
        "gc_opts": os.environ.get("SPARK_GC_OPTS", "<default>"),
        "shuf": spark.conf.get("spark.sql.shuffle.partitions"),
        "conf": os.environ.get("PROBE_CONF", ""),
        "walls": walls, "median": med, "total": round(wall, 1),
        "jvm_cpu_s": round(cpu, 1),
        "sys_s": round(sys_s, 1),
        "cpu_per_iter": round(cpu / max(1, len(walls)), 2),
        "util": round(cpu / wall / par, 2),
        "gc_s_per_iter": round(gc_ms / 1000.0 / max(1, len(walls)), 2),
        "gc_count": gc_n,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
