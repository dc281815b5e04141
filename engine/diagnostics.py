"""Shuffle-skew diagnostics — the measurement half of the north rule's
"partitioning/shuffle/skew handled explicitly".

The engine's skew *mitigations* live where they act (hub salting in
engine/algos/pagerank.py, AQE skew-join splits in engine/session.py,
capped fan-outs in engine/derive.py); this module is the *instrument*: a
one-pass profile of any prospective join/groupBy key that says whether a
key is hot, how hot, and what salt factor would level it. Run it on a
sample or the full table BEFORE shipping a 100-TB job — a 10^8-row hot
key found in production costs a re-run; found here it costs one line
(``salt_buckets=...`` or a broadcast rewrite).

Everything is two jobs over one aggregated per-key count table:
key-count percentiles via ``approx_percentile`` (KLL-style sketch,
bounded memory at any key cardinality; exact below the accuracy window)
and a top-k heavy-hitter list via TakeOrderedAndProject.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SkewReport:
    rows: int
    n_keys: int
    max_count: int
    mean_count: float
    p50: int
    p90: int
    p99: int
    top: list[tuple]          # [(key..., count)] heaviest first
    skew_factor: float        # max_count / mean_count
    partitions: int           # the shuffle width the advice assumes
    suggested_salt: int       # 1 = no salting needed

    def is_skewed(self, factor: float = 8.0) -> bool:
        """Heuristic: a key family is worth salting when the hottest key
        exceeds ``factor`` x the even-split per-partition row budget —
        below that, AQE's skew-join splitting and partial aggregation
        absorb it."""
        return self.suggested_salt > factor


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
    partitions: int | None = None,
) -> SkewReport:
    """Profile the distribution of rows per key.

    ``suggested_salt`` = ceil(max_count / (rows / partitions)) — the
    number of sub-keys needed so the hottest key's largest shard fits the
    per-partition row budget an even shuffle would give every task. 1
    means the hottest key already fits. ``partitions`` defaults to the
    session's shuffle-partition setting (what a groupBy/join on this key
    would actually use)."""
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    counts = counts.localCheckpoint(eager=True)
    try:
        stats = counts.agg(
            F.sum("cnt").alias("rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_count"),
            F.avg("cnt").alias("mean_count"),
            F.expr(
                "approx_percentile(cnt, array(0.5, 0.9, 0.99), 10000)"
            ).alias("pct"),
        ).collect()[0]
        top = [
            tuple(r)
            for r in counts.orderBy(
                F.desc("cnt"), *[F.asc(c) for c in key_cols]
            ).limit(top_k).collect()
        ]
    finally:
        counts.unpersist()
    rows = int(stats["rows"] or 0)
    if rows == 0:
        return SkewReport(0, 0, 0, 0.0, 0, 0, 0, [], 0.0, partitions, 1)
    budget = rows / partitions
    return SkewReport(
        rows=rows,
        n_keys=int(stats["n_keys"]),
        max_count=int(stats["max_count"]),
        mean_count=float(stats["mean_count"]),
        p50=int(stats["pct"][0]),
        p90=int(stats["pct"][1]),
        p99=int(stats["pct"][2]),
        top=top,
        skew_factor=float(stats["max_count"]) / float(stats["mean_count"]),
        partitions=partitions,
        suggested_salt=max(1, math.ceil(stats["max_count"] / budget)),
    )
