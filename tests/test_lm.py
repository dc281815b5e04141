"""Stupid-backoff n-gram LM vs an exact pure-python oracle.

The oracle reimplements the EXACT contract documented in engine/lm.py
(padding, count tables, backoff chain, OOV floor, N definition) with
dict counters — any drift between the Spark when-chain and the spec
shows up as a per-event log-score mismatch, not a fuzzy aggregate."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from engine import lm as LM


def _py_lm(texts, n, lowercase=True):
    counts = Counter()
    for t in texts:
        toks = (t.lower() if lowercase else t).split()
        p = [LM.BOS] * (n - 1) + toks + [LM.EOS]
        for k in range(1, n + 1):
            for i in range(len(p) - k + 1):
                counts[" ".join(p[i : i + k])] += 1
    N = sum(v for g, v in counts.items() if " " not in g)
    return counts, N


def _py_score(text, counts, N, n, alpha, lowercase=True, min_count=1):
    c = lambda g: counts[g] if counts[g] >= min_count else 0
    toks = (text.lower() if lowercase else text).split()
    p = [LM.BOS] * (n - 1) + toks + [LM.EOS]
    lp = 0.0
    events = 0
    for i in range(n - 1, len(p)):
        events += 1
        for k in range(n, 0, -1):
            g = " ".join(p[i - k + 1 : i + 1])
            if k > 1 and c(g):
                ctx = " ".join(p[i - k + 1 : i])
                lp += (n - k) * math.log(alpha) + math.log(c(g) / c(ctx))
                break
            if k == 1:
                if c(g):
                    lp += (n - 1) * math.log(alpha) + math.log(c(g) / N)
                else:
                    lp += (n - 1) * math.log(alpha) + math.log(1.0 / N)
    return lp, events


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat ate the fish",
    "a dog and a cat played",
    "the fish swam in the sea",
]


def test_train_counts_exact(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    model = LM.train_ngram_lm(docs, n=3, alpha=0.4)
    want, N = _py_lm(CORPUS, 3)
    got = {r.gram: r.cnt for r in model.grams.collect()}
    assert got == dict(want)
    assert model.total_tokens == N
    assert model.vocab_size == len([g for g in want if " " not in g])


@pytest.mark.parametrize("n", [2, 3, 4])
def test_score_matches_oracle_every_doc(spark, n):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    model = LM.train_ngram_lm(docs, n=n, alpha=0.4)
    counts, N = _py_lm(CORPUS, n)
    # score held-out docs too: backoff at every order + OOV floor all fire
    queries = CORPUS + [
        "the cat sat on the log",  # seen grams, unseen trigram path
        "a fish ate the dog",  # bigram/unigram backoff
        "quantum zebras rollerblade",  # pure OOV floor
        "the the the the",  # degenerate repetition
    ]
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(queries)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in LM.score_perplexity(qdf, model).collect()}
    assert set(got) == set(range(len(queries)))
    for i, t in enumerate(queries):
        lp, ev = _py_score(t, counts, N, n, 0.4)
        assert got[i].n_events == ev, f"doc {i}: events"
        assert got[i].logprob == pytest.approx(lp, rel=1e-12), f"doc {i}"
        assert got[i].ppl == pytest.approx(math.exp(-lp / ev), rel=1e-12)


def test_min_count_prunes_consistently(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    model = LM.train_ngram_lm(docs, n=3, alpha=0.4, min_count=2)
    # every surviving gram's context also survives (backoff consistency)
    kept = {r.gram for r in model.grams.collect()}
    for g in kept:
        toks = g.split(" ")
        if len(toks) > 1:
            assert " ".join(toks[:-1]) in kept
    counts, N = _py_lm(CORPUS, 3)
    got = {
        r.doc_id: r
        for r in LM.score_perplexity(docs, model).collect()
    }
    for i, t in enumerate(CORPUS):
        lp, ev = _py_score(t, counts, N, 3, 0.4, min_count=2)
        assert got[i].logprob == pytest.approx(lp, rel=1e-12), f"doc {i}"


def test_perplexity_separates_in_domain_from_gibberish(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    model = LM.train_ngram_lm(docs, n=3, alpha=0.4)
    probe = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "zxq vplk wrrth gnnb")],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.ppl for r in LM.score_perplexity(probe, model).collect()}
    assert s[0] < s[1] / 10  # in-domain at least 10x less perplexed
    kept = LM.perplexity_filter(probe, model, max_ppl=(s[0] + s[1]) / 2)
    assert [r.doc_id for r in kept.collect()] == [0]


def test_contracts_and_invariance(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="n must be"):
        LM.train_ngram_lm(docs, n=1)
    with pytest.raises(ValueError, match="alpha"):
        LM.train_ngram_lm(docs, alpha=0.0)
    with pytest.raises(ValueError, match="empty corpus"):
        LM.train_ngram_lm(docs.filter(F.length("text") == 0))
    # partitioning invariance of the whole train+score path (n_events and
    # the branch taken per event are set-determined; the per-doc float sum
    # is compared at 1e-12 — log-score addition is the only order-varying
    # step and test docs are short enough for exact-ish agreement)
    m1 = LM.train_ngram_lm(docs, n=3)
    m2 = LM.train_ngram_lm(docs.repartition(7), n=3)
    a = {r.doc_id: r for r in LM.score_perplexity(docs, m1).collect()}
    b = {
        r.doc_id: r
        for r in LM.score_perplexity(docs.repartition(5), m2).collect()
    }
    for i in a:
        assert a[i].n_events == b[i].n_events
        assert a[i].logprob == pytest.approx(b[i].logprob, rel=1e-12)
