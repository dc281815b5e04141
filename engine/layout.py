"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning (public knowledge: Morton 1966; the technique behind Delta Lake's
OPTIMIZE ZORDER BY and Hudi/Iceberg clustering).

Why it matters at 100 TB: parquet/Iceberg prune files by min/max column
stats. Range-partitioning by ONE column makes predicates on that column
cheap and predicates on every other column full scans; interleaving the
bits of k columns into one sort key gives every interleaved column
locality, so a selective predicate on ANY of them touches O(few) files.
The writer-side cost is one extra projection + the same repartitionByRange
the write was already doing.

Everything here is codegen'd column expressions: the interleave is
``k*bits`` shift/mask/or terms (no UDF), min/max scaling is one scalar
aggregate pass + one projection. The locality claim is tested
deterministically (a box query touches strictly fewer z-buckets than
single-column range buckets on a grid), and the Morton math is tested
bit-exactly against a python oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list, bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (non-negative ints < 2**bits each) into
    one long: bit b of column i lands at position b*k + i. Precondition on
    the value range is the caller's (use ``minmax_scale``); k*bits must
    fit a signed long."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs >= 2 columns (1 column is a sort)")
    if k * bits > 63:
        raise ValueError(
            f"zorder_key: {k} cols x {bits} bits = {k * bits} > 63 bits — "
            f"lower bits (precision beyond the file-pruning granularity is "
            f"wasted anyway)"
        )
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        c = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return out


def minmax_scale(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Adds ``<col>_z`` integer columns scaled to [0, 2**bits) by the
    column's observed min/max — ONE scalar aggregate job for all columns,
    then a pure projection. Constant columns scale to 0."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    top = (1 << bits) - 1
    out = df
    for c in cols:
        if row[f"_mn_{c}"] is None:
            raise ValueError(
                f"minmax_scale: column {c!r} has no non-null values — "
                f"cannot derive a layout range (drop it from the z-order "
                f"columns or fill it first)"
            )
        mn, mx = float(row[f"_mn_{c}"]), float(row[f"_mx_{c}"])
        span = mx - mn
        if span <= 0:
            scaled = F.lit(0).cast("long")
        else:
            scaled = F.least(
                F.lit(top).cast("long"),
                F.floor((F.col(c).cast("double") - F.lit(mn))
                        / F.lit(span) * F.lit(top + 1)).cast("long"),
            )
        out = out.withColumn(f"{c}_z", scaled)
    return out


def zorder_layout(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for writing: min/max-scale the layout columns,
    range-partition by the Morton key and sort within partitions — each
    output file then covers a compact hyper-rectangle of the key space,
    so min/max stats prune on EVERY layout column. Drop-in before
    ``.write.parquet(...)``; the helper columns are removed."""
    scaled = minmax_scale(df, cols, bits)
    z = zorder_key([f"{c}_z" for c in cols], bits)
    return (
        scaled.withColumn("_zkey", z)
        .repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"{c}_z" for c in cols])
    )
