"""Duplicate-span removal (engine/span_dedup.py) vs a pure-python oracle
implementing the same spec: windows, counts, min-(doc,pos) canonical,
coverage rebuild. Plus: keep-first across documents, overlap merging,
short-doc passthrough, min_count threshold, determinism, contracts."""

from __future__ import annotations

import pytest

from engine.span_dedup import (
    duplicated_spans,
    remove_duplicate_spans,
    window_occurrences,
)


def _oracle(texts: dict[int, str], width: int, min_count: int):
    """(kept_text, n_removed) per doc_id, same spec as the module."""
    toks = {d: t.split() for d, t in texts.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - width + 1):
            occ.setdefault(tuple(tk[p:p + width]), []).append((d, p))
    drop: dict[int, set[int]] = {d: set() for d in toks}
    for places in occ.values():
        if len(places) >= min_count:
            canon = min(places)
            for d, p in places:
                if (d, p) != canon:
                    drop[d].update(range(p, p + width))
    out = {}
    for d, tk in toks.items():
        kept = [w for i, w in enumerate(tk) if i not in drop[d]]
        out[d] = (" ".join(kept), len(tk) - len(kept))
    return out


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )


def _run(spark, texts, width, min_count=2):
    rows = remove_duplicate_spans(
        _docs(spark, texts), width=width, min_count=min_count
    ).collect()
    return {r.doc_id: (r.text, r.n_tokens_removed) for r in rows}


BOILER = "subscribe to our newsletter for daily updates and offers today"


def test_matches_oracle_planted_boilerplate(spark):
    texts = {
        0: f"alpha beta gamma {BOILER} delta epsilon zeta eta theta",
        1: f"one two three four five six {BOILER} seven eight nine",
        2: f"{BOILER} unrelated tail words here to pad things out fine",
        3: "completely unique document with no repeated content at all okay",
    }
    for width in (5, 8, 10):
        got = _run(spark, texts, width)
        want = _oracle(texts, width, 2)
        assert got == want, width
    # keep-first: doc 0 (smallest id) keeps the boilerplate verbatim
    got = _run(spark, texts, 10)
    assert BOILER in got[0][0]
    assert BOILER not in got[1][0] and BOILER not in got[2][0]
    assert got[3] == (texts[3], 0)


def test_overlapping_repeats_merge(spark):
    # one long shared passage -> many overlapping duplicate windows; the
    # whole passage vanishes from the copy, not just disjoint chunks
    passage = " ".join(f"w{i}" for i in range(30))
    texts = {0: f"intro {passage} outro", 1: f"start {passage} end"}
    width = 6
    got = _run(spark, texts, width)
    want = _oracle(texts, width, 2)
    assert got == want
    assert got[1][0] == "start end"
    assert got[1][1] == 30


def test_short_docs_pass_through(spark):
    texts = {0: "tiny doc", 1: "tiny doc", 2: "three word doc"}
    got = _run(spark, texts, width=5)
    assert got == {d: (t, 0) for d, t in texts.items()}
    assert window_occurrences(_docs(spark, texts), width=5).count() == 0


def test_min_count_threshold(spark):
    seg = " ".join(f"s{i}" for i in range(10))
    texts = {0: f"a {seg} b", 1: f"c {seg} d", 2: f"e {seg} f"}
    # min_count=4 > 3 occurrences -> nothing removed
    got = _run(spark, texts, width=10, min_count=4)
    assert all(n == 0 for _, n in got.values())
    got = _run(spark, texts, width=10, min_count=3)
    assert got == _oracle(texts, 10, 3)
    assert got[1][1] > 0 and got[2][1] > 0 and got[0][1] == 0


def test_within_document_repeats(spark):
    # the same doc repeating itself: second occurrence removed, first kept
    seg = " ".join(f"r{i}" for i in range(8))
    texts = {0: f"{seg} middle {seg}", 5: "other doc text entirely here now"}
    got = _run(spark, texts, width=8)
    assert got == _oracle(texts, 8, 2)
    assert got[0][0] == f"{seg} middle"


def test_determinism_and_contracts(spark):
    texts = {0: f"x {BOILER} y", 1: f"z {BOILER} w"}
    a = _run(spark, texts, width=6)
    b = _run(spark, texts, width=6)
    assert a == b
    with pytest.raises(ValueError, match="width"):
        window_occurrences(_docs(spark, texts), width=1)
    with pytest.raises(ValueError, match="min_count"):
        duplicated_spans(
            window_occurrences(_docs(spark, texts), width=5), min_count=1
        )
