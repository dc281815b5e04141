"""Document chunking vs a pure-python window oracle (exact text match),
coverage/overlap invariants, short/empty docs, disjoint-mode
reconstruction, validation."""

from __future__ import annotations

import pytest

from engine.chunking import chunk_documents


def _oracle(text, size, stride):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return []
    if n <= size:
        starts = [0]
    else:
        last = -(-(n - size) // stride) * stride
        starts = list(range(0, last + 1, stride))
    return [
        (i, s, " ".join(toks[s : s + size])) for i, s in enumerate(starts)
    ]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_oracle_random_lengths(spark):
    import random

    rng = random.Random(4)
    texts = [
        " ".join(f"t{j}" for j in range(rng.randrange(0, 40)))
        for _ in range(30)
    ]
    for size, stride in [(8, 8), (8, 4), (5, 2), (1, 1), (10, 7)]:
        got = {}
        rows = chunk_documents(_docs(spark, texts), size, stride).collect()
        for r in rows:
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_start, r.chunk_text)
            )
        for i, t in enumerate(texts):
            assert sorted(got.get(i, [])) == _oracle(t, size, stride), (
                i, size, stride,
            )


def test_coverage_and_overlap_invariants(spark):
    text = " ".join(f"w{i}" for i in range(23))
    rows = sorted(
        chunk_documents(_docs(spark, [text]), size=8, stride=5).collect(),
        key=lambda r: r.chunk_start,
    )
    covered = set()
    for r in rows:
        assert r.chunk_tokens <= 8
        covered.update(range(r.chunk_start, r.chunk_start + r.chunk_tokens))
    assert covered == set(range(23))  # every token in >= 1 chunk
    for a, b in zip(rows, rows[1:]):
        assert b.chunk_start - a.chunk_start == 5  # stride respected


def test_short_empty_and_disjoint_reconstruction(spark):
    rows = chunk_documents(
        _docs(spark, ["a b c", "", "   ", None]), size=10
    ).collect()
    assert len(rows) == 1  # empty/whitespace/null docs yield no chunks
    assert rows[0].chunk_text == "a b c" and rows[0].chunk_tokens == 3
    # disjoint mode (stride == size) reconstructs the document exactly
    text = " ".join(f"x{i}" for i in range(17))
    parts = sorted(
        chunk_documents(_docs(spark, [text]), size=5).collect(),
        key=lambda r: r.chunk_start,
    )
    assert " ".join(p.chunk_text for p in parts) == text


def test_validation(spark):
    d = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="size"):
        chunk_documents(d, size=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, size=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, size=4, stride=0)


def test_whitespace_edges_match_oracle(spark):
    # tabs/newlines at document edges must not create phantom empty
    # tokens or garbage chunks (code-review r4, confirmed divergence)
    texts = [
        "hello world\n",
        "\tleading tab here",
        "\n\t",
        "a\tb\nc  d",
        "  spaced  out  ",
    ]
    for size, stride in [(2, 2), (3, 1)]:
        rows = chunk_documents(_docs(spark, texts), size, stride).collect()
        got = {}
        for r in rows:
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_start, r.chunk_text)
            )
        for i, t in enumerate(texts):
            assert sorted(got.get(i, [])) == _oracle(t, size, stride), (
                i, size, stride,
            )
