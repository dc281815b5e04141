"""Benchmark decontamination: n-gram collision pairs vs an exact pure-python
shingle-intersection oracle, and the anti-join contract of decontaminate."""

from __future__ import annotations

import re

import pytest

from engine.dedup import contamination_pairs, decontaminate

TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog every single day"),
    (2, "completely unrelated text about spark partitions and shuffles"),
    (3, "What is the capital of France Paris is the capital of France"),
    (4, "the quick brown fox jumps over the lazy dog"),  # shares with 1
    (5, ""),
]

BENCH = [
    (100, "What is the capital of France"),
    (101, "the lazy dog every single day indeed"),
]


def _sh(text, n):
    toks = [t for t in re.split(r" +", re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t != ""]
    if not toks:
        return {""}
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def oracle(n, min_shared=1):
    out = {}
    for did, dt in TRAIN:
        for bid, bt in BENCH:
            shared = len(_sh(dt, n) & _sh(bt, n))
            if shared >= min_shared:
                out[(did, bid)] = shared
    return out


@pytest.fixture(scope="module")
def dfs(spark):
    d = spark.createDataFrame(TRAIN, ["doc_id", "text"]).cache()
    b = spark.createDataFrame(BENCH, ["doc_id", "text"]).cache()
    return d, b


@pytest.mark.parametrize("n,min_shared", [(3, 1), (3, 2), (5, 1)])
def test_pairs_match_oracle(spark, dfs, n, min_shared):
    d, b = dfs
    got = {
        (r.doc_id, r.bench_id): r.shared
        for r in contamination_pairs(d, b, shingle_n=n, min_shared=min_shared).collect()
    }
    assert got == oracle(n, min_shared)


def test_decontaminate_removes_exactly_flagged(spark, dfs):
    d, b = dfs
    flagged = {did for (did, _) in oracle(3)}
    kept = {r.doc_id for r in decontaminate(d, b, shingle_n=3).collect()}
    assert kept == {did for did, _ in TRAIN} - flagged
    assert kept  # something survives (doc 2 shares nothing)


def test_benchmark_self_hit(spark, dfs):
    """A doc textually containing a benchmark question must be flagged at
    the full question length."""
    d, b = dfs
    got = oracle(6)
    assert (3, 100) in got  # 6-gram "what is the capital of france"
    pairs = {
        (r.doc_id, r.bench_id)
        for r in contamination_pairs(d, b, shingle_n=6).collect()
    }
    assert (3, 100) in pairs


def test_min_shared_validation(spark, dfs):
    d, b = dfs
    with pytest.raises(ValueError):
        contamination_pairs(d, b, min_shared=0)
