"""BPE vocabulary learning (engine/bpe.py): the classic Sennrich corpus
produces the hand-derived merge sequence, distributed word counts match a
python Counter, rank-order encode reproduces the training segmentation
and round-trips, and the driver-dict bound + dict-dry stop are honest."""

from __future__ import annotations

from collections import Counter

import pytest

from engine.bpe import END, BPEModel, encode_bpe, learn_bpe, word_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def sennrich(spark):
    # the worked example from Sennrich et al. 2016: low*5 lower*2
    # newest*6 widest*3
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = _docs(spark, texts)
    counts = word_counts(docs).localCheckpoint(eager=True)
    return docs, counts


def test_word_counts_match_counter(spark):
    texts = ["The cat SAT", "the  cat", "sat sat\tsat", "", "  "]
    got = {r.word: r.n for r in word_counts(_docs(spark, texts)).collect()}
    want = Counter(
        w for t in texts for w in t.lower().split() if w
    )
    assert got == dict(want)


def test_hand_derived_merge_sequence(sennrich):
    _, counts = sennrich
    model = learn_bpe(counts, n_merges=5)
    # hand derivation: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
    assert model.merges == (
        ("e", "s"), ("es", "t"), ("est", END), ("l", "o"), ("lo", "w"),
    )


def test_encode_reproduces_training_segmentation(spark, sennrich):
    docs, counts = sennrich
    model = learn_bpe(counts, n_merges=10)
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in encode_bpe(docs, model).collect()
    }
    # after 10 merges "newest" is a single token; check the known states
    rows = {r.doc_id: r.text for r in docs.collect()}
    for did, toks in enc.items():
        # roundtrip: concatenation minus the end marker == the word
        assert "".join(toks).replace(END, "") == rows[did]
    newest_doc = next(d for d, t in rows.items() if t == "newest")
    assert enc[newest_doc] == ["newest" + END]


def test_deterministic_and_dict_dry_stop(sennrich):
    _, counts = sennrich
    m1 = learn_bpe(counts, n_merges=50, min_freq=2)
    m2 = learn_bpe(counts, n_merges=50, min_freq=2)
    assert m1.merges == m2.merges
    # dict runs dry below min_freq long before 50 merges
    assert len(m1.merges) < 50
    assert m1.n_requested == 50  # the shortfall is visible, not silent


def test_min_freq_respected(sennrich):
    _, counts = sennrich
    model = learn_bpe(counts, n_merges=100, min_freq=3)
    # "lower" (n=2) contributes pairs of weight 2; none may be merged
    # unless shared with low/newest/widest at total >= 3
    assert ("er", END) not in model.merges
    assert ("e", "r") not in model.merges


def test_max_words_guard(spark):
    counts = word_counts(_docs(spark, ["a b c d e f g h"]))
    with pytest.raises(ValueError, match="max_words"):
        learn_bpe(counts, n_merges=5, max_words=3)


def test_encode_with_empty_model(spark):
    docs = _docs(spark, ["ab ba"])
    out = encode_bpe(docs, BPEModel((), 0, 2)).collect()[0]
    assert list(out.bpe_tokens) == ["a", "b", END, "b", "a", END]
    assert out.n_bpe_tokens == 6
