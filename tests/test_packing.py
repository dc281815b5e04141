"""Sequence packing — budget safety, exact greedy-oracle parity per
stream, determinism under repartitioning, oversize flagging."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import packing as P

SCHEMA = "doc_id long, n_tokens long"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 1 + (i * 37) % 900) for i in range(500)]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    return df


def _collect(packed):
    return sorted(
        (r.stream, r.batch_id, r.key, r.length, r.pos, r.batch_tokens,
         r.oversize)
        for r in packed.collect()
    )


def test_budget_never_exceeded(docs):
    packed = P.pack_sequences(docs, 1000, "n_tokens", ["doc_id"], streams=8)
    rows = packed.collect()
    assert len(rows) == 500  # every doc packed exactly once
    totals = {}
    for r in rows:
        totals.setdefault(r.batch_id, []).append(r)
    for bid, batch in totals.items():
        tokens = sum(r.length for r in batch)
        assert all(r.batch_tokens == tokens for r in batch)
        assert sorted(r.pos for r in batch) == list(range(len(batch)))
        if not batch[0].oversize:
            assert tokens <= 1000, bid
        else:
            assert len(batch) == 1 and tokens > 1000


def test_oversize_flagged_singleton(spark):
    df = spark.createDataFrame([(1, 50), (2, 5000), (3, 60)], SCHEMA)
    rows = P.pack_sequences(df, 100, "n_tokens", ["doc_id"], streams=1).collect()
    over = [r for r in rows if r.oversize]
    assert len(over) == 1 and over[0].length == 5000
    assert {r.key for r in rows} == {"1", "2", "3"}


def test_greedy_oracle_exact(docs):
    """Re-simulate the next-fit greedy in python from the same hash order
    and require identical batch structure."""
    packed = P.pack_sequences(docs, 777, "n_tokens", ["doc_id"], streams=4)
    got = {}
    for r in packed.collect():
        got.setdefault(r.batch_id, []).append((r.pos, r.key, r.length))
    # recover each stream's row order from (batch_id, pos) — batch ids
    # ascend in stream order, pos within batch
    streams = {}
    for bid in sorted(got):
        for pos, key, ln in sorted(got[bid]):
            streams.setdefault(bid >> 40, []).append((key, ln, bid))
    for s, seq in streams.items():
        # greedy replay: same order must reproduce the same boundaries
        cur_total, cur_bid = 0, None
        expect_new = True
        for key, ln, bid in seq:
            if ln > 777:
                expect_new = True
                assert bid != cur_bid
                cur_bid, cur_total = bid, ln
                expect_new = True
                continue
            if expect_new or cur_total + ln > 777:
                assert bid != cur_bid, (s, key)
                cur_bid, cur_total = bid, ln
                expect_new = False
            else:
                assert bid == cur_bid, (s, key)
                cur_total += ln


def test_determinism_under_repartition(docs):
    a = _collect(P.pack_sequences(docs, 512, "n_tokens", ["doc_id"], streams=8))
    b = _collect(
        P.pack_sequences(docs.repartition(11), 512, "n_tokens", ["doc_id"],
                         streams=8)
    )
    assert a == b


def test_packing_stats(docs):
    packed = P.pack_sequences(docs, 1000, "n_tokens", ["doc_id"], streams=8)
    st = P.packing_stats(packed, 1000).collect()[0]
    n_batches = packed.select("batch_id").distinct().count()
    assert st.n_batches == n_batches
    assert st.n_oversize == 0
    assert 0.5 < st.mean_fill <= 1.0  # next-fit fills > half on mixed lengths


def test_validation(docs):
    with pytest.raises(ValueError, match="budget"):
        P.pack_sequences(docs, 0, "n_tokens", ["doc_id"])
    with pytest.raises(ValueError, match="streams"):
        P.pack_sequences(docs, 10, "n_tokens", ["doc_id"], streams=0)
