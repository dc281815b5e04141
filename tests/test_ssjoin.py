"""Exact prefix-filtered Jaccard join (engine/ssjoin.py) vs brute force.

The operator claims EXACT recall at the threshold — so the oracle is
all-pairs brute force over collected token sets, compared as whole pair
sets with exact values (the final verify division is the same IEEE
divide the oracle performs, so no tolerance is needed)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from engine.ssjoin import jaccard_join, jaccard_join_sets


def _brute(sets: dict, t: float):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= t:
            out[(a, b)] = (inter, len(sa), len(sb), j)
    return out


def _tokens_df(spark, sets: dict):
    rows = [(i, tok) for i, s in sets.items() for tok in s]
    return spark.createDataFrame(rows, "doc_id int, tok string")


def _got(df):
    return {
        (r.a, r.b): (r.inter, r.size_a, r.size_b, r.jaccard)
        for r in df.collect()
    }


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_matches_brute_force_random(spark, threshold):
    rng = random.Random(41 + int(threshold * 10))
    vocab = [f"w{i}" for i in range(40)]
    sets = {
        i: frozenset(rng.sample(vocab, rng.randint(1, 12)))
        for i in range(60)
    }
    got = _got(jaccard_join_sets(_tokens_df(spark, sets), threshold))
    want = _brute({k: set(v) for k, v in sets.items()}, threshold)
    assert got == want


def test_boundary_pair_exactly_at_threshold(spark):
    # inter=4, union=5 -> jaccard == the double nearest 0.8, which is the
    # SAME double as the literal 0.8 -> the pair must be kept at t=0.8.
    sets = {1: {"a", "b", "c", "d", "e"}, 2: {"a", "b", "c", "d"}}
    got = _got(jaccard_join_sets(_tokens_df(spark, sets), 0.8))
    assert (1, 2) in got
    inter, sa, sb, j = got[(1, 2)]
    assert (inter, sa, sb) == (4, 5, 4) and j == 4 / 5


def test_identical_and_disjoint(spark):
    sets = {1: {"x", "y"}, 2: {"x", "y"}, 3: {"p", "q"}}
    got = _got(jaccard_join_sets(_tokens_df(spark, sets), 1.0))
    assert set(got) == {(1, 2)} and got[(1, 2)][3] == 1.0


def test_duplicate_membership_rows_collapse(spark):
    df = _tokens_df(spark, {1: {"x", "y"}, 2: {"x", "y"}})
    dup = df.unionByName(df)  # sets, not bags
    got = _got(jaccard_join_sets(dup, 0.9))
    assert got[(1, 2)][:3] == (2, 2, 2)


def test_null_tokens_ignored(spark):
    rows = [(1, "x"), (1, None), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id int, tok string")
    got = _got(jaccard_join_sets(df, 0.5))
    assert got[(1, 2)] == (1, 1, 1, 1.0)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    sets = {i: set(rng.sample(vocab, rng.randint(2, 10))) for i in range(40)}
    df = _tokens_df(spark, sets)
    a = _got(jaccard_join_sets(df, 0.5))
    b = _got(jaccard_join_sets(df.repartition(13), 0.5))
    assert a == b


def test_hot_token_cap_is_loud_lower_bound(spark, caplog):
    # "stop" is in every doc; rare tokens differ. At t=0.3 the pair
    # (0, 1) is true (jaccard 1/3) but its ONLY shared token is the hot
    # one — capping excludes it from prefixes, so the pair is lost: the
    # result is a recall lower bound, and it warns loudly. The identical
    # pair (4, 5) survives via its rare shared token.
    sets = {i: {"stop", f"r{i}"} for i in range(6)}
    sets[5] = {"stop", "r4"}  # (4, 5) identical -> shares rare "r4"
    df = _tokens_df(spark, sets)
    exact = _got(jaccard_join_sets(df, 0.3))
    assert (0, 1) in exact and (4, 5) in exact
    import logging

    with caplog.at_level(logging.WARNING, logger="verum_spark.ssjoin"):
        capped = _got(jaccard_join_sets(df, 0.3, max_token_docs=3))
    assert (0, 1) not in capped          # lost through the hot token
    assert (4, 5) in capped              # rare-token pairs survive
    assert set(capped) < set(exact)
    assert any("lower bound" in m.lower() for m in caplog.messages)


def test_threshold_validation(spark):
    df = _tokens_df(spark, {1: {"x"}})
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            jaccard_join_sets(df, bad)


def test_doc_wrapper_matches_minhash_shingle_family(spark):
    # jaccard_join must ground-truth minhash_candidates: same shingles.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with no overlap at all here"),
        ],
        "doc_id int, text string",
    )
    got = _got(jaccard_join(docs, 0.5, shingle_n=3))
    from engine.dedup import _shingles

    sh = _shingles(docs, 3)
    sets = {}
    for r in sh.collect():
        sets.setdefault(r.doc_id, set()).add(r.sh)
    assert got == _brute(sets, 0.5)
    assert (1, 2) in got and not any(3 in p for p in got)


def test_exact_recall_vs_minhash_candidates(spark):
    # The stated purpose: measure what the sketch loses. Exact pairs are
    # a superset-in-recall reference; every MinHash candidate that truly
    # meets the threshold appears in the exact result.
    rng = random.Random(99)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(30):
        w = list(base)
        if i % 3:
            w[rng.randrange(len(w))] = f"mut{i}"
        rng.shuffle(w)
        rows.append((i, " ".join(w)))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    exact = set(_got(jaccard_join(docs, 0.6, shingle_n=2)))
    from engine.dedup import minhash_candidates, ngram_jaccard_pairs

    cand = minhash_candidates(docs, k=16, bands=4, shingle_n=2)
    verified = ngram_jaccard_pairs(docs, cand, shingle_n=2).filter(
        F.col("jaccard") >= 0.6
    )
    mh = {(r.a, r.b) for r in verified.collect()}
    assert mh <= exact  # sketch recall is a subset of exact recall


def test_plan_has_no_cartesian(spark):
    # every stage is an equi-join (prefix-token, length/position filters
    # ride as join-condition filters) — a Cartesian or broadcast-nested-
    # loop anywhere means the prefix filter fell out of the plan
    rng = random.Random(3)
    sets = {i: set(rng.sample([f"w{j}" for j in range(20)], 5)) for i in range(20)}
    df = _tokens_df(spark, sets)
    plan = (
        jaccard_join_sets(df, 0.5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
