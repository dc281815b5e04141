"""DSIR-style importance resampling: logw wiring (equals the difference
of the two scorings exactly), target-style documents outrank source-style
ones, temperature-0 == deterministic argmax-k, Gumbel determinism under
repartitioning, k/temperature validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import lm as LM
from engine.selection import importance_resample, importance_weights

TARGET = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat ate the fish",
    "the fish swam in the sea",
]
SOURCE = [
    "buy cheap pills now click here",
    "click now buy now cheap deals",
    "cheap deals click here now",
    "pills deals buy here click",
]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def lms(spark):
    t = LM.train_ngram_lm(_docs(spark, TARGET), n=2, alpha=0.4)
    s = LM.train_ngram_lm(_docs(spark, SOURCE), n=2, alpha=0.4)
    return t, s


@pytest.fixture(scope="module")
def pool(spark):
    # interleaved pool: 4 target-like, 4 source-like
    texts = [
        "the cat sat on the log",
        "buy cheap pills here",
        "the dog ate the fish",
        "click here now deals",
        "the fish sat on the mat",
        "cheap pills now buy",
        "the sea ate the cat",
        "deals deals click now",
    ]
    return _docs(spark, texts, start=100)


def test_logw_is_exactly_the_scoring_difference(spark, lms, pool):
    t_lm, s_lm = lms
    w = {r.doc_id: r for r in importance_weights(pool, t_lm, s_lm).collect()}
    lt = {r.doc_id: r.logprob for r in LM.score_perplexity(pool, t_lm).collect()}
    ls = {r.doc_id: r.logprob for r in LM.score_perplexity(pool, s_lm).collect()}
    assert set(w) == set(lt) == set(ls)
    for d in w:
        assert w[d].logw == pytest.approx(lt[d] - ls[d], abs=1e-12)
        assert w[d].logw_per_token == pytest.approx(
            w[d].logw / w[d].n_events, abs=1e-12
        )


def test_target_style_outranks_source_style(spark, lms, pool):
    t_lm, s_lm = lms
    w = {r.doc_id: r.logw_per_token
         for r in importance_weights(pool, t_lm, s_lm).collect()}
    target_like = [100, 102, 104, 106]
    source_like = [101, 103, 105, 107]
    assert min(w[d] for d in target_like) > max(w[d] for d in source_like)
    # and the argmax-4 selection is exactly the target-like docs
    sel = importance_resample(pool, t_lm, s_lm, k=4, temperature=0)
    assert sorted(r.doc_id for r in sel.collect()) == target_like


def test_temperature_zero_equals_argmax_topk(spark, lms, pool):
    t_lm, s_lm = lms
    sel = importance_resample(pool, t_lm, s_lm, k=3, temperature=0)
    got = [r.doc_id for r in sel.collect()]
    want = [
        r.doc_id
        for r in importance_weights(pool, t_lm, s_lm)
        .orderBy(F.col("logw_per_token").desc(), F.col("doc_id").asc())
        .limit(3)
        .collect()
    ]
    assert got == want


def test_gumbel_selection_deterministic_under_partitioning(spark, lms, pool):
    t_lm, s_lm = lms
    a = importance_resample(pool, t_lm, s_lm, k=4, temperature=1.0)
    b = importance_resample(
        pool.repartition(7), t_lm, s_lm, k=4, temperature=1.0
    )
    rows_a = sorted((r.doc_id, r.gumbel_key) for r in a.collect())
    rows_b = sorted((r.doc_id, r.gumbel_key) for r in b.collect())
    assert rows_a == rows_b
    # a different salt reshuffles the noise (same weights, other draw)
    c = importance_resample(
        pool, t_lm, s_lm, k=4, temperature=1.0, salt="other"
    )
    assert sorted(r.gumbel_key for r in c.collect()) != sorted(
        k for _, k in rows_a
    )


def test_k_covers_pool_and_validation(spark, lms, pool):
    t_lm, s_lm = lms
    assert importance_resample(pool, t_lm, s_lm, k=100).count() == pool.count()
    with pytest.raises(ValueError, match="k must be"):
        importance_resample(pool, t_lm, s_lm, k=0)
    with pytest.raises(ValueError, match="temperature"):
        importance_resample(pool, t_lm, s_lm, k=1, temperature=-1.0)


def test_unscoreable_docs_fail_loudly(spark, lms):
    t_lm, s_lm = lms
    pool = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="empty/NULL text"):
        importance_resample(pool, t_lm, s_lm, k=2)
