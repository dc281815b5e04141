"""Physical-plan assertions for the round-4 pipeline operators — the
zero/one-shuffle claims in their docstrings must be REALIZED in the
executed plan, not just stated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import packing as P
from engine import sampling as SA
from engine import web as W
from engine.snapshot import diff_snapshots


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(df):
    return _plan(df).count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", f"http://h{i % 5}.example.com/p/{i}?q={i}",
          10 + i % 90)
         for i in range(200)],
        "doc_id long, source string, url string, n_tokens long",
    ).cache()
    df.count()
    return df


def test_url_features_zero_shuffle(docs):
    assert _exchanges(W.url_features(docs)) == 0


def test_weighted_resample_zero_shuffle(docs):
    out = SA.weighted_resample(docs, {"src0": 2.5}, "source", ["doc_id"])
    assert _exchanges(out) == 0


def test_hash_sample_zero_shuffle(docs):
    assert _exchanges(SA.hash_sample(docs, 0.5, ["doc_id"])) == 0


def test_pack_sequences_single_shuffle(docs):
    out = P.pack_sequences(docs, 256, "n_tokens", ["doc_id"], streams=4)
    assert _exchanges(out) == 1  # only the stream groupBy


def test_filter_domains_broadcast_only(docs, spark):
    feats = W.url_features(docs)
    block = spark.createDataFrame([("example.com",)], "d string")
    out = W.filter_domains(feats, block)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_sweep_edge_binning_broadcast_only(spark):
    # localcluster._bin_edges_by_rank: the O(E) prefix-pricing pass must
    # broadcast the (<= top_k)-row rank map, never shuffle the edge table
    from engine.algos.localcluster import _bin_edges_by_rank

    canon = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "src long, dst long"
    ).cache()
    canon.count()
    rank_map = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "vid long, sweep_rank int"
    )
    binned = _bin_edges_by_rank(canon, rank_map, 10)
    plan = _plan(binned)
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning") == 0


def test_classifier_scoring_is_map_only(spark):
    # classifier.score_docs: one codegen'd map pass over the features —
    # the 100-TB filter must not shuffle anything
    from engine.classifier import score_docs, train_doc_classifier, doc_features

    docs = spark.createDataFrame(
        [(i, ("clean alpha prose words " * (2 + i % 3)) if i % 2 == 0
          else "123 45%% 6789 )(*&")
         for i in range(40)],
        "doc_id long, text string",
    )
    feats = doc_features(docs).localCheckpoint(eager=True)
    labels = spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(40)],
        "doc_id long, label double",
    )
    clf = train_doc_classifier(feats, labels, max_iter=8)
    assert _exchanges(score_docs(clf, feats)) == 0


def test_diff_snapshots_one_exchange_per_side(spark):
    old = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    new = spark.range(50, 150).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    d = diff_snapshots(old, new, ["k"])
    # thin digests: the join carries (k, digest) only — 2 exchanges (one
    # per side); AQE may demote to broadcast, in which case fewer.
    assert _exchanges(d) <= 2
    # the payload column does NOT cross the exchange in thin mode
    plan = _plan(d)
    assert "__d_old" in plan and "v" not in d.columns
