"""Count-min sketch (overestimate-only invariant, exactness at generous
width, error bound at tight width, cell-wise mergeability, weighted mass)
and Misra–Gries heavy hitters (never-overcount + guaranteed-presence
bounds vs exact counts on zipf data, determinism, validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.sketch import cms_build, cms_merge, cms_query, heavy_hitters


def _zipf_df(spark, n=4000, vocab=200):
    """Deterministic zipf-ish key column: key i appears ~n/(i+1) times."""
    return (
        spark.range(n)
        .select(
            F.pmod(
                F.pmod(F.xxhash64("id"), F.lit(997)) * F.pmod(F.xxhash64("id"), F.lit(997)),
                F.lit(vocab),
            ).cast("long").alias("key")
        )
    )


def _exact(df):
    return {
        r.key: float(r.c)
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_cms_overestimates_and_exact_at_generous_width(spark):
    df = _zipf_df(spark)
    exact = _exact(df)
    sk = cms_build(df, "key", depth=4, width=8192)
    est = {
        r.key: float(r.est)
        for r in cms_query(sk, df.select("key").distinct(), "key").collect()
    }
    sk.cells.unpersist()
    assert est.keys() == exact.keys()
    for key, true in exact.items():
        assert est[key] >= true  # the CMS invariant, unconditionally
    # 200 keys into 4x8192 cells: collisions are essentially impossible
    assert est == exact
    assert sk.n == sum(exact.values())


def test_cms_error_bound_at_tight_width(spark):
    df = _zipf_df(spark)
    exact = _exact(df)
    sk = cms_build(df, "key", depth=4, width=64)  # forced collisions
    est = {
        r.key: float(r.est)
        for r in cms_query(sk, df.select("key").distinct(), "key").collect()
    }
    sk.cells.unpersist()
    import math

    bound = math.e * sk.n / 64
    ok = sum(1 for k in exact if est[k] <= exact[k] + bound)
    for k in exact:
        assert est[k] >= exact[k]
    # the eN/w bound holds per-item with prob 1 - e^-4 ~ 98%; demand 90%
    assert ok >= 0.9 * len(exact)


def test_cms_merge_equals_union(spark):
    df = _zipf_df(spark, n=3000)
    a = df.filter(F.col("key") % 2 == 0)
    b = df.filter(F.col("key") % 2 == 1)
    ska, skb = cms_build(a, "key", 4, 512), cms_build(b, "key", 4, 512)
    sku = cms_build(df, "key", 4, 512)
    skm = cms_merge(ska, skb)
    mu = {(r.d, r.b): float(r.cnt) for r in sku.cells.collect()}
    mm = {(r.d, r.b): float(r.cnt) for r in skm.cells.collect()}
    for s in (ska, skb, sku, skm):
        s.cells.unpersist()
    assert mu == mm and skm.n == sku.n
    with pytest.raises(ValueError, match="mismatch"):
        cms_merge(ska, cms_build(df, "key", 4, 256))


def test_cms_weighted_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 3.0), ("b", 1.0), (None, 99.0)],
        "key string, w double",
    )
    sk = cms_build(df, "key", depth=3, width=128, weight_col="w")
    est = {
        r.key: float(r.est)
        for r in cms_query(
            sk, spark.createDataFrame([("a",), ("b",)], "key string"), "key"
        ).collect()
    }
    sk.cells.unpersist()
    assert est == {"a": 5.0, "b": 1.0}
    assert sk.n == 6.0  # the NULL row's weight never entered


def test_heavy_hitters_bounds_vs_exact(spark):
    df = _zipf_df(spark)
    exact = _exact(df)
    n = sum(exact.values())
    k, shards = 16, 8
    hh = heavy_hitters(df, "key", k=k, n_shards=shards)
    got = {int(r.key): float(r.est) for r in hh.collect()}
    assert len(got) <= k * shards
    for key, est in got.items():
        assert est <= exact[key] + 1e-9  # never overcounts
    # presence + undercount bound: conservatively, every shard's mass is
    # <= n, so anything with freq > n/(k+1) MUST be present within n/(k+1)
    for key, true in exact.items():
        if true > n / (k + 1):
            assert key in got
            assert got[key] >= true - n / (k + 1)


def test_heavy_hitters_deterministic_and_validates(spark):
    df = _zipf_df(spark, n=2000)
    a = sorted((r.key, r.est) for r in heavy_hitters(df, "key", k=8).collect())
    b = sorted(
        (r.key, r.est)
        for r in heavy_hitters(df.repartition(13), "key", k=8).collect()
    )
    assert a == b  # hash shards, not physical partitions
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "key", k=0)
    with pytest.raises(ValueError, match="depth/width"):
        cms_build(df, "key", depth=0)


def test_heavy_hitters_rejects_bad_shards(spark):
    df = _zipf_df(spark, n=100)
    with pytest.raises(ValueError, match="n_shards"):
        heavy_hitters(df, "key", k=4, n_shards=0)


def test_cms_folds_across_stream_microbatches(spark, tmp_path):
    """The 'merge across days' claim, witnessed in Structured Streaming:
    foreachBatch builds a per-micro-batch CMS and cms_merge folds it into
    a running sketch; the fold equals the one-shot batch sketch cell-for-
    cell (CMS is a linear sketch — batch boundaries cannot matter)."""
    feed = str(tmp_path / "cfeed")
    ckpt = str(tmp_path / "cckpt")
    # two disjoint row ranges of the same generator (df.subtract would
    # dedupe rows set-wise and empty the second half — keys repeat)
    def slice_df(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.pmod(
                    F.pmod(F.xxhash64("id"), F.lit(997))
                    * F.pmod(F.xxhash64("id"), F.lit(997)),
                    F.lit(200),
                ).cast("long").alias("key")
            )
        )

    slice_df(0, 1000).coalesce(1).write.mode("append").parquet(feed)
    slice_df(1000, 2000).coalesce(1).write.mode("append").parquet(feed)

    folded = {"sk": None}

    def fold(batch_df, _bid):
        sk = cms_build(batch_df, "key", depth=4, width=256)
        folded["sk"] = sk if folded["sk"] is None else cms_merge(folded["sk"], sk)

    q = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    want = cms_build(spark.read.parquet(feed), "key", depth=4, width=256)
    got_cells = {(r.d, r.b): float(r.cnt) for r in folded["sk"].cells.collect()}
    want_cells = {(r.d, r.b): float(r.cnt) for r in want.cells.collect()}
    assert got_cells == want_cells
    assert folded["sk"].n == want.n == 2000.0
    folded["sk"].cells.unpersist()
    want.cells.unpersist()
