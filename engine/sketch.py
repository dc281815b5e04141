"""Frequency sketches: count-min and Misra–Gries heavy hitters.

Why sketches when ``groupBy(col).count()`` is exact: at 100 TB the exact
histogram of a high-cardinality column (tokens, URLs, shingles) is itself
a giant table that must be shuffled, stored, and re-shuffled to merge
across days. A sketch is a FIXED-SIZE summary (kilobytes) that merges by
addition — the right object to checkpoint per batch and fold across a
streaming/incremental pipeline (the same reason engine/text.py uses
HLL++ for distinct counts).

Public semantics:

* Count-min (Cormode & Muthukrishnan, J.Algorithms 2005): depth d hash
  rows x width w buckets; update adds to one bucket per row; estimate =
  min over rows. Guarantees est >= true always, and est <= true + eN/w
  with prob 1 - exp(-d) (e = Euler's number, N = total mass).
* Misra–Gries (1982) / space-saving summaries, merged per Agarwal et
  al. "Mergeable Summaries" (PODS 2012): k counters per partition;
  any item with frequency > N/(k+1) survives, and every reported count
  undercounts by at most the summary's error bound. The merge (sum
  counters, then subtract the (k+1)-th largest and drop <= 0) keeps the
  bound additive across partitions.

Spark shape:

* CMS build is pure JVM codegen: explode each value into d (row, bucket)
  pairs via ``posexplode`` over a literal depth array, then one
  partial-aggregable groupBy over AT MOST d*w cells — the shuffle moves
  the sketch, never the data. Queries are a broadcast join of the d
  cells per probed item.
* MG runs as one ``applyInPandas`` over hash-grouped shards (each shard
  summarises its slice in O(k) memory) + a single final combine of
  n_shards * k rows — two-level tree aggregation, no driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CountMinSketch:
    """``cells``: (d, b, cnt) — sparse (absent cell = 0). Merge two
    sketches with :func:`cms_merge` (parameters must match). ``n`` is
    the total inserted mass (needed for the error bound)."""

    cells: DataFrame
    depth: int
    width: int
    n: float


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> CountMinSketch:
    """Count-min sketch of ``df[col]`` (optionally weighted). NULLs are
    skipped (a NULL key has no frequency; counting it would silently
    pollute one bucket per row)."""
    if depth < 1 or width < 1:
        raise ValueError(f"cms_build: depth/width must be >= 1, got {depth}/{width}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("k"), w.alias("w")
    )
    rows = src.select(
        F.posexplode(F.array(*[F.lit(i) for i in range(depth)])).alias("d", "_"),
        "k",
        "w",
    )
    cells = (
        rows.select(
            "d",
            F.pmod(F.xxhash64("k", F.col("d")), F.lit(width)).alias("b"),
            "w",
        )
        .groupBy("d", "b")
        .agg(F.sum("w").alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=True)
    # total mass = the d=0 row's cell sum (every input row contributes to
    # every depth row) — read from the <=width-cell sketch, never a second
    # pass over the data
    n = (
        cells.filter(F.col("d") == 0).agg(F.sum("cnt")).collect()[0][0] or 0.0
    )
    return CountMinSketch(cells=cells, depth=depth, width=width, n=float(n))


def cms_query(sketch: CountMinSketch, items: DataFrame, col: str) -> DataFrame:
    """(col, est) — count-min estimate per probed item: min over the
    depth cells, absent cells = 0. ``items`` should be small relative to
    the data (the sketch side is broadcast — it is at most depth*width
    rows by construction)."""
    probes = items.select(F.col(col)).distinct()
    exploded = probes.select(
        col,
        F.posexplode(F.array(*[F.lit(i) for i in range(sketch.depth)])).alias(
            "d", "_"
        ),
    ).select(
        col,
        "d",
        F.pmod(F.xxhash64(F.col(col), F.col("d")), F.lit(sketch.width)).alias("b"),
    )
    return (
        exploded.join(F.broadcast(sketch.cells), ["d", "b"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0.0))).alias("est"))
    )


def cms_merge(a: CountMinSketch, b: CountMinSketch) -> CountMinSketch:
    """Sketch of the UNION of the two inputs — cell-wise addition.
    Parameters must match (different hash layouts don't merge)."""
    if (a.depth, a.width) != (b.depth, b.width):
        raise ValueError(
            f"cms_merge: parameter mismatch {(a.depth, a.width)} vs "
            f"{(b.depth, b.width)}"
        )
    cells = (
        a.cells.union(b.cells)
        .groupBy("d", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    return CountMinSketch(cells=cells, depth=a.depth, width=a.width, n=a.n + b.n)


def _mg_fold(keys: pd.Series, wts: pd.Series, k: int) -> dict:
    """Sequential Misra–Gries over one in-memory slice: k counters."""
    ctr: dict = {}
    for key, wt in zip(keys, wts):
        if key in ctr:
            ctr[key] += wt
        elif len(ctr) < k:
            ctr[key] = wt
        else:
            # decrement-all by the new item's weight, clamped at the
            # smallest counter (weighted MG, standard generalization)
            dec = min(wt, min(ctr.values()))
            ctr = {c: v - dec for c, v in ctr.items() if v - dec > 0}
            if wt - dec > 0:
                ctr[key] = wt - dec
    return ctr


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 64,
    n_shards: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """(col, est) — Misra–Gries summary of the whole table, at most
    n_shards*k rows. Shards are hash classes of the KEY (not physical
    partitions), so every occurrence of a key lands in one shard: the
    within-shard count is exact, shard key sets are disjoint (merge is a
    plain union, no cross-shard decrement), and the result is
    partitioning-invariant and deterministic. Guarantees: ``est`` never
    overcounts; every item with true frequency > (its shard's mass)/(k+1)
    is present and undercounted by at most that bound — with even hash
    mixing that threshold is ~N/(n_shards*(k+1)), k-counter memory per
    shard."""
    if k < 1:
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"heavy_hitters: n_shards must be >= 1, got {n_shards}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    src = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("k"),
        w.alias("w"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(n_shards)).alias(
            "shard"
        ),
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact pre-aggregation inside the shard (a shard holds every
        # occurrence of its keys — hash-sharded — so this is lossless),
        # then MG trims to k counters
        g = pdf.groupby("k", sort=False)["w"].sum()
        ctr = _mg_fold(pd.Series(g.index), g.values, k)
        return pd.DataFrame({"k": list(ctr.keys()), "est": list(ctr.values())})

    shard_sums = src.groupBy("shard").applyInPandas(
        summarize, schema="k string, est double"
    )
    # Hash sharding sends ALL occurrences of a key to one shard, so the
    # shard summaries have disjoint key sets: the "merge" is a union, no
    # decrement needed, and per-key error stays within the shard bound.
    return shard_sums.withColumnRenamed("k", col)
