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


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership sketch + semi-join pruning
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BloomFilter:
    """Dense bit array as 64-bit words (``words[i]`` holds bits
    64i..64i+63), built by :func:`bloom_build`. Fixed size, mergeable by
    bitwise OR (:func:`bloom_merge`); ``might_contain`` has NO false
    negatives and a false-positive rate ~(1-e^{-kn/m})^k (Bloom, CACM
    1970)."""

    words: tuple
    m_bits: int
    k_hashes: int
    n_items: int

    @property
    def fpp_estimate(self) -> float:
        """Expected false-positive probability at the built load."""
        import math

        if self.m_bits == 0 or self.n_items == 0:
            return 0.0
        return (1.0 - math.exp(-self.k_hashes * self.n_items / self.m_bits)) ** self.k_hashes


def _bloom_positions(col, k_hashes: int, m_bits: int):
    """k (word, bit) expressions for one key column — seeded xxhash64,
    the same JVM-codegen hash family as the CMS above."""
    out = []
    for i in range(k_hashes):
        pos = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
        out.append((
            F.floor(pos / 64).cast("int"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
            ),
        ))
    return out


def bloom_build(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_bytes: int = 64 << 20,
) -> BloomFilter:
    """Bloom filter of ``df[col]`` (NULLs skipped — NULL never equi-joins,
    so membership is meaningless for it).

    Sizing is the textbook optimum: m = -n·ln p / (ln 2)^2 bits,
    k = (m/n)·ln 2 hashes. ``expected_items`` defaults to one
    ``approx_count_distinct`` pass. The filter must broadcast — that is
    its entire point — so ``max_bytes`` fails LOUDLY instead of silently
    building a filter too big to ship to executors.

    Spark shape: each key explodes into k (word, bit) pairs, one
    partial-aggregable ``groupBy(word).agg(bit_or(bit))`` — the shuffle
    moves at most m/64 rows (the sketch), never the data. This is the
    engine-level form of Spark's own InjectRuntimeFilter, exposed for
    multi-action pipelines where the build side is computed in an
    earlier job and Catalyst cannot see across the boundary.
    """
    import math

    if not 0.0 < fpp < 1.0:
        raise ValueError(f"bloom_build: fpp must be in (0,1), got {fpp}")
    src = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("k"))
    if expected_items is None:
        expected_items = int(
            src.agg(F.approx_count_distinct("k").alias("n")).collect()[0]["n"]
        )
    n = max(1, expected_items)
    m_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m_bits = ((m_bits + 63) // 64) * 64
    if m_bits // 8 > max_bytes:
        raise ValueError(
            f"bloom_build: {n} items at fpp={fpp} needs {m_bits // 8} bytes "
            f"> max_bytes={max_bytes}; raise fpp, lower expected_items, or "
            f"raise max_bytes if the broadcast can afford it"
        )
    k_hashes = max(1, min(16, round(m_bits / n * math.log(2))))

    pairs = [
        src.select(w.alias("word"), b.alias("bit"))
        for (w, b) in _bloom_positions(F.col("k"), k_hashes, m_bits)
    ]
    allp = pairs[0]
    for p in pairs[1:]:
        allp = allp.unionByName(p)
    rows = (
        allp.groupBy("word").agg(F.bit_or("bit").alias("bits")).collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    return BloomFilter(tuple(words), m_bits, k_hashes, n)


def bloom_merge(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Filter of the UNION of the two builds — word-wise OR. Parameters
    must match (different geometries don't merge)."""
    if (a.m_bits, a.k_hashes) != (b.m_bits, b.k_hashes):
        raise ValueError(
            f"bloom_merge: geometry mismatch {(a.m_bits, a.k_hashes)} vs "
            f"{(b.m_bits, b.k_hashes)}"
        )
    words = tuple(x | y for x, y in zip(a.words, b.words))
    return BloomFilter(words, a.m_bits, a.k_hashes, a.n_items + b.n_items)


def bloom_prune(df: DataFrame, col: str, bf: BloomFilter) -> DataFrame:
    """Rows of ``df`` whose ``col`` might be in the filter — a SUPERSET of
    the true semi-join (false positives pass, false negatives never
    happen; NULL keys are dropped, matching semi-join semantics).

    Map-only: the word array rides in as a one-row broadcast
    (BroadcastNestedLoopJoin of a single row — no literal-tree blowup at
    8M-long filters, no shuffle of ``df``), and the k probes are
    ``element_at`` + bitwise-AND, all whole-stage codegen."""
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        [(list(bf.words),)], "__bloom_words array<long>"
    )
    probes = _bloom_positions(F.col(col), bf.k_hashes, bf.m_bits)
    cond = F.lit(True)
    for w, b in probes:
        word = F.get(F.col("__bloom_words"), w)  # 0-based, Column index
        cond = cond & (word.bitwiseAND(b) != 0)
    return (
        df.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(bdf))
        .filter(cond)
        .drop("__bloom_words")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    fpp: float = 0.01,
    exact: bool = True,
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """left-semi join of ``big`` against ``small`` on ``key``, pruned by a
    Bloom filter of the small side FIRST.

    Why this exists at 100 TB: a plain shuffle semi-join moves EVERY big
    row to its hash partition before any key can be rejected; when the
    small side hits only a sliver of the big side (decontamination
    lists, revoked-repo sets, sampled audit keys), the filter rejects
    ~all rows map-side and the shuffle carries only survivors + false
    positives. ``exact=True`` (default) follows with the true semi-join
    on the pruned remnant, so the result is EXACTLY the semi-join;
    ``exact=False`` returns the superset (rows-only use, e.g. counting
    upper bounds) and is a pure map job over ``big``."""
    bf = bloom_build(small, key, fpp=fpp, max_bytes=max_bytes)
    pruned = bloom_prune(big, key, bf)
    if not exact:
        return pruned
    return pruned.join(
        small.select(F.col(key)).distinct(), key, "left_semi"
    )
