"""Snapshot diff — change detection between two immutable table versions
(the daily-build primitive: what did today's crawl add, drop, or modify
relative to yesterday's?). The output feeds the engine's incremental
path (engine/incremental.py folds the `added` side; `removed` drives the
retraction-tolerant component refresh).

One full-outer join on the key, one comparison expression — Catalyst
plans it as a single sort-merge (or AQE-skew-split) exchange per side;
comparison columns are hashed to one 64-bit digest per row FIRST when
``compare_cols`` is wide, so the join carries (key, digest), not the
payload — at 100 TB the exchange moves two thin columns per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    thin: bool = True,
) -> DataFrame:
    """(key..., status) with status ∈ added | removed | changed | unchanged.

    ``compare_cols`` defaults to every non-key column the two schemas
    share (order-insensitive). ``thin=True`` (default) reduces each
    side to (key, xxhash64(compare cols)) before the join — the 100-TB
    shape; pass False to keep payload columns joined for debugging.
    Null-safe: a null compare value equals null (hash treats null as a
    distinct stable token), and rows are matched on exact key equality.

    Duplicate keys within a side are rejected loudly — diff semantics
    need a keyed table, and a silent many-to-many join would fabricate
    statuses."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    digest = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
          for c in compare_cols]
    ) if compare_cols else F.lit(0)

    def side(df, tag):
        cols = [*key_cols, digest.alias(f"__d_{tag}")]
        if not thin:
            cols += [
                F.col(c).alias(f"{tag}_{c}") for c in compare_cols
            ]
        out = df.select(*cols)
        dups = (
            out.groupBy(*key_cols).count().filter(F.col("count") > 1)
            .limit(1).count()
        )
        if dups:
            raise ValueError(
                f"duplicate keys in the {tag!r} snapshot — diff needs "
                f"unique {key_cols}"
            )
        return out

    o, n = side(old, "old"), side(new, "new")
    status = (
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old") == F.col("__d_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, key_cols, "full_outer")
        .withColumn("status", status)
        .drop("__d_old", "__d_new")
    )


def diff_stats(diff: DataFrame) -> DataFrame:
    """(status, n) rollup of a diff — the one-line daily-build report."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
