"""Bloom filter / bloom_semi_join: no false negatives, bounded false
positives, exact mode == plain semi-join, map-only probe plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from engine.sketch import (
    BloomFilter,
    bloom_build,
    bloom_merge,
    bloom_prune,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def sides(spark):
    big = spark.range(0, 20_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.col("id") % 97).alias("payload"),
    )
    # small side: every 40th key — plus keys that do NOT exist in big
    small = spark.range(0, 20_000, 40).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    ).unionByName(
        spark.range(0, 10).select(
            F.concat(F.lit("ghost"), F.col("id")).alias("key")
        )
    )
    return big.cache(), small.cache()


def test_no_false_negatives(spark, sides):
    big, small = sides
    bf = bloom_build(small, "key", fpp=0.01)
    pruned = bloom_prune(big, "key", bf)
    true_semi = big.join(small, "key", "left_semi")
    # every true member survives the prune
    assert true_semi.join(pruned, ["key", "payload"], "left_anti").count() == 0


def test_false_positive_rate_bounded(spark, sides):
    big, small = sides
    bf = bloom_build(small, "key", fpp=0.01)
    pruned = bloom_prune(big, "key", bf)
    n_true = big.join(small, "key", "left_semi").count()
    n_pruned = pruned.count()
    n_non_members = big.count() - n_true
    fp_rate = (n_pruned - n_true) / max(1, n_non_members)
    # generous 5x slack over the configured fpp — this is a statistical
    # bound, not an exact one, but 5% vs 1% would mean a broken hash mix
    assert fp_rate <= 5 * 0.01, fp_rate


def test_exact_semi_join_equality(spark, sides):
    big, small = sides
    got = bloom_semi_join(big, small, "key", exact=True)
    want = big.join(small.select("key").distinct(), "key", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_superset_mode_counts(spark, sides):
    big, small = sides
    sup = bloom_semi_join(big, small, "key", exact=False).count()
    true_n = big.join(small, "key", "left_semi").count()
    assert sup >= true_n


def test_probe_plan_is_map_only(spark, sides):
    """The whole point: the big side reaches the filter without any
    Exchange — rejection happens map-side, pre-shuffle."""
    big, small = sides
    bf = bloom_build(small, "key", fpp=0.01)
    plan = bloom_prune(big, "key", bf)._jdf.queryExecution().executedPlan().toString()
    # the only allowed exchange is the one-row broadcast of the words
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"shuffle in probe plan: {line}\n{plan}")
    assert "BroadcastNestedLoopJoin" in plan


def test_merge_is_union(spark):
    a_df = spark.range(0, 500).select(F.concat(F.lit("a"), "id").alias("k"))
    b_df = spark.range(0, 500).select(F.concat(F.lit("b"), "id").alias("k"))
    n = 1000
    a = bloom_build(a_df, "k", expected_items=n, fpp=0.01)
    b = bloom_build(b_df, "k", expected_items=n, fpp=0.01)
    m = bloom_merge(a, b)
    both = a_df.unionByName(b_df)
    assert bloom_prune(both, "k", m).count() == 1000  # no false negatives
    # geometry mismatch is loud
    c = bloom_build(a_df, "k", expected_items=50, fpp=0.5)
    with pytest.raises(ValueError, match="geometry"):
        bloom_merge(a, c)


def test_nulls_dropped_like_semi_join(spark):
    big = spark.createDataFrame(
        [("x",), (None,), ("y",)], "key string"
    )
    small = spark.createDataFrame([("x",), (None,)], "key string")
    got = bloom_semi_join(big, small, "key", exact=True)
    assert [r["key"] for r in got.collect()] == ["x"]


def test_empty_small_side_rejects_everything(spark, sides):
    big, _ = sides
    empty = spark.createDataFrame([], "key string")
    bf = bloom_build(empty, "key", fpp=0.01)
    assert bloom_prune(big, "key", bf).count() == 0


def test_size_contract_is_loud(spark, sides):
    _, small = sides
    with pytest.raises(ValueError, match="max_bytes"):
        bloom_build(small, "key", expected_items=10**9, fpp=0.0001,
                    max_bytes=1 << 20)
    with pytest.raises(ValueError, match="fpp"):
        bloom_build(small, "key", fpp=1.5)


def test_determinism_and_fpp_estimate(spark, sides):
    _, small = sides
    a = bloom_build(small, "key", expected_items=512, fpp=0.01)
    b = bloom_build(small.repartition(7), "key", expected_items=512, fpp=0.01)
    assert a.words == b.words and a.k_hashes == b.k_hashes
    assert isinstance(a, BloomFilter)
    assert 0.0 < a.fpp_estimate < 0.05
