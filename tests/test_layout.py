"""Z-order layout (engine/layout.py): Morton key bit-exact vs a python
oracle, min/max scaling bounds, the deterministic locality win (a box
query touches fewer z-buckets than single-column range buckets), and the
file-level min/max pruning effect on a real parquet write."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from engine.layout import minmax_scale, zorder_key, zorder_layout


def _morton(vals, bits):
    out = 0
    k = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * k + i)
    return out


def test_morton_key_bit_exact(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256, (i * 13) % 16)
            for i in range(300)]
    df = spark.createDataFrame(rows, "i long, x long, y long, w long")
    got = {r.i: r.z for r in
           df.select("i", zorder_key(["x", "y"], bits=8).alias("z")).collect()}
    for i, x, y, _ in rows:
        assert got[i] == _morton([x, y], 8), (i, x, y)
    small = [(i, i % 16, (i * 7) % 16, (i * 3) % 16) for i in range(200)]
    dfs = spark.createDataFrame(small, "i long, x long, y long, w long")
    got3 = {r.i: r.z for r in
            dfs.select("i", zorder_key(["x", "y", "w"], bits=4).alias("z")).collect()}
    for i, x, y, w in small:
        assert got3[i] == _morton([x, y, w], 4), (i, x, y, w)


def test_key_contract_fails_loudly():
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(["x"])
    with pytest.raises(ValueError, match="> 63 bits"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_minmax_scale_bounds(spark):
    df = spark.createDataFrame(
        [(float(v), 7) for v in (-3.0, 0.0, 2.5, 10.0)], "x double, c long"
    )
    out = minmax_scale(df, ["x", "c"], bits=8)
    xs = {r.x: r.x_z for r in out.collect()}
    assert xs[-3.0] == 0 and xs[10.0] == 255
    assert all(0 <= v <= 255 for v in xs.values())
    assert xs[0.0] < xs[2.5]
    # constant column scales to 0, not a division error
    assert {r.c_z for r in out.collect()} == {0}


def _buckets_touched(df, key_col, n_buckets, pred):
    """Range-partition by key_col into n_buckets; how many partitions hold
    at least one row matching pred (== files a pruned scan must read)."""
    with_pid = (
        df.repartitionByRange(n_buckets, key_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    return with_pid.filter(pred).select("_pid").distinct().count()


def test_box_query_locality_beats_single_column_range(spark):
    # 32x32 grid, 16 buckets of 64 points. Box = x in [0,16) x y in [8,12):
    # x-range layout spreads 16 x-columns over 8 buckets; z-order packs
    # the box into aligned 8x8 quads -> strictly fewer buckets.
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    z = df.withColumn("zkey", zorder_key(["x", "y"], bits=5))
    pred = (F.col("x") < 16) & (F.col("y") >= 8) & (F.col("y") < 12)
    z_touched = _buckets_touched(z, "zkey", 16, pred)
    x_touched = _buckets_touched(z, "x", 16, pred)
    assert z_touched < x_touched, (z_touched, x_touched)


def test_parquet_minmax_pruning_effect(spark, tmp_path):
    """The point of z-order: a selective predicate on the NON-leading
    column prunes files by min/max stats. x-range layout makes every file
    span the full y axis (zero y-pruning); z-order files cover compact
    y-ranges, so a y-band predicate skips most of them. (At equal file
    count z-order does NOT shrink the x-span*y-span area — it trades
    leading-column span for the other columns'; the pruning count below
    is the statistic that matters, measured from the files themselves.)"""
    import pyarrow.parquet as pq
    import os

    pts = [((i * 193) % 1024, (i * 997) % 1024) for i in range(4096)]
    df = spark.createDataFrame(pts, "x long, y long")

    def files_overlapping(path, col, lo, hi):
        n = tot = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            tot += 1
            vals = pq.read_table(os.path.join(path, f)).column(col).to_pylist()
            if min(vals) < hi and max(vals) >= lo:
                n += 1
        return n, tot

    p_plain = str(tmp_path / "plain")
    p_z = str(tmp_path / "zord")
    df.repartitionByRange(8, "x").write.parquet(p_plain)
    zorder_layout(df, ["x", "y"], n_partitions=8).write.parquet(p_z)
    py_hit, plain_tot = files_overlapping(p_plain, "y", 0, 64)
    zy_hit, z_tot = files_overlapping(p_z, "y", 0, 64)
    assert py_hit == plain_tot  # x-range layout: y prunes NOTHING
    assert zy_hit <= z_tot // 2, (zy_hit, z_tot)  # z-order: y prunes most
    # the honest trade: x-pruning coarsens to ~sqrt granularity (8 files
    # = 3 interleaved prefix bits, only 1-2 of them x bits), but the SUM
    # over one selective predicate per column — the workload z-order is
    # for — touches strictly fewer files than the single-column layout
    px_hit, _ = files_overlapping(p_plain, "x", 0, 64)
    zx_hit, _ = files_overlapping(p_z, "x", 0, 64)
    assert zx_hit + zy_hit < px_hit + py_hit, (
        (zx_hit, zy_hit), (px_hit, py_hit))
    # layout preserved the data exactly
    back = spark.read.parquet(p_z)
    assert back.count() == 4096
    assert sorted((r.x, r.y) for r in back.collect()) == sorted(pts)


def test_minmax_scale_all_null_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "x long, y double"
    )
    with pytest.raises(ValueError, match="no non-null"):
        minmax_scale(df, ["y"], bits=4)
