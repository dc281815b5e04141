"""skew_report vs exact python counting — counts, heavy hitters, and the
salt recommendation formula."""

from __future__ import annotations

import math
from collections import Counter

from engine.diagnostics import skew_report


def _mkdf(spark, keys):
    return spark.createDataFrame([(k, i) for i, k in enumerate(keys)],
                                 "k string, payload long")


def test_skew_report_exact_counts(spark):
    # one mega-key (600), a medium (90), a tail of 31 singles
    keys = ["hot"] * 600 + ["warm"] * 90 + [f"t{i}" for i in range(31)]
    rep = skew_report(_mkdf(spark, keys), ["k"], top_k=3, partitions=8)
    c = Counter(keys)
    assert rep.rows == len(keys)
    assert rep.n_keys == len(c)
    assert rep.max_count == 600
    assert rep.mean_count == len(keys) / len(c)
    assert rep.top[0] == ("hot", 600) and rep.top[1] == ("warm", 90)
    assert len(rep.top) == 3 and rep.top[2][1] == 1
    # 721 rows over 8 partitions -> ~90-row budget; 600-row key needs 7 salts
    assert rep.suggested_salt == math.ceil(600 / (len(keys) / 8))
    assert rep.skew_factor == 600 / rep.mean_count
    assert rep.is_skewed(factor=5.0)
    # percentiles: 33 keys, counts sorted = [1]*31 + [90, 600]
    assert rep.p50 == 1
    assert rep.p99 in (90, 600)


def test_uniform_keys_need_no_salt(spark):
    keys = [f"k{i % 16}" for i in range(1600)]
    rep = skew_report(_mkdf(spark, keys), ["k"], partitions=16)
    assert rep.max_count == 100
    assert rep.suggested_salt == 1
    assert not rep.is_skewed()


def test_composite_key_and_default_partitions(spark):
    from pyspark.sql import functions as F

    df = _mkdf(spark, ["a"] * 10 + ["b"] * 2).withColumn("k2", F.lit("x"))
    rep = skew_report(df, ["k", "k2"])
    assert rep.partitions == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert rep.top[0] == ("a", "x", 10)


def test_empty_input(spark):
    rep = skew_report(
        spark.createDataFrame([], "k string, payload long"), ["k"]
    )
    assert rep.rows == 0 and rep.n_keys == 0 and rep.suggested_salt == 1
    assert rep.top == []
