"""DeepWalk embeddings (engine/embeddings.py): schema/coverage, seeded
determinism (single training partition), community structure showing up
in cosine space, the max_vocab fail-loudly guard, and the
walks->Word2Vec->ANN splice."""

from __future__ import annotations

import math

import pytest

from engine.algos.walks import random_walks
from engine.embeddings import (
    similar_vertices,
    train_node_embeddings,
    walks_to_sentences,
)
from tests.conftest import edges_df


def _two_cliques_edges():
    # Two K6 cliques bridged by one edge, symmetrized (walks follow
    # out-edges; both directions make every walk position reachable).
    a = list(range(6))
    b = list(range(100, 106))
    und = (
        [(x, y) for i, x in enumerate(a) for y in a[i + 1:]]
        + [(x, y) for i, x in enumerate(b) for y in b[i + 1:]]
        + [(0, 100)]
    )
    return [(u, v) for u, v in und] + [(v, u) for u, v in und], a, b


def _emb_map(emb_df):
    return {r.vid: list(r.embedding) for r in emb_df.collect()}


def _cos(x, y):
    dot = sum(p * q for p, q in zip(x, y))
    nx_ = math.sqrt(sum(p * p for p in x))
    ny = math.sqrt(sum(q * q for q in y))
    return dot / (nx_ * ny)


@pytest.fixture(scope="module")
def clique_walks(spark):
    pairs, a, b = _two_cliques_edges()
    walks = random_walks(
        spark, edges_df(spark, pairs), walk_length=8, walks_per_vertex=8,
        seed=5,
    ).localCheckpoint(eager=True)
    return walks, a, b


def test_sentences_and_coverage(spark, clique_walks):
    walks, a, b = clique_walks
    sents = walks_to_sentences(walks)
    assert sents.columns == ["sentence"]
    assert sents.schema["sentence"].dataType.simpleString() == "array<string>"
    emb = train_node_embeddings(spark, walks, dim=16, max_iter=1)
    got = _emb_map(emb)
    # every vertex walked over gets a vector of the requested dimension
    assert set(got) == set(a) | set(b)
    assert all(len(v) == 16 for v in got.values())


def test_deterministic_with_seed(spark, clique_walks):
    walks, _, _ = clique_walks
    e1 = _emb_map(train_node_embeddings(spark, walks, dim=8, seed=9))
    e2 = _emb_map(train_node_embeddings(spark, walks, dim=8, seed=9))
    assert e1 == e2  # bit-identical: num_partitions=1, fixed seed


def test_cliques_separate_in_cosine_space(spark, clique_walks):
    walks, a, b = clique_walks
    got = _emb_map(
        train_node_embeddings(spark, walks, dim=16, window=4, max_iter=4)
    )
    intra = [
        _cos(got[x], got[y])
        for grp in (a, b)
        for i, x in enumerate(grp)
        for y in grp[i + 1:]
    ]
    cross = [_cos(got[x], got[y]) for x in a for y in b]
    assert sum(intra) / len(intra) > sum(cross) / len(cross) + 0.1


def test_max_vocab_guard(spark, clique_walks):
    walks, _, _ = clique_walks
    with pytest.raises(ValueError, match="max_vocab"):
        train_node_embeddings(spark, walks, dim=4, max_vocab=3)


def test_similar_vertices_splice(spark, clique_walks):
    walks, a, b = clique_walks
    emb = train_node_embeddings(
        spark, walks, dim=16, window=4, max_iter=4
    ).localCheckpoint(eager=True)
    nn = similar_vertices(emb, [3, 103], k=3)
    rows = nn.collect()
    assert {r.query_id for r in rows} == {3, 103}
    by_q = {}
    for r in rows:
        assert r.neighbor_id != r.query_id  # self excluded
        by_q.setdefault(r.query_id, []).append(r)
    for q, grp in by_q.items():
        assert [r.rank for r in sorted(grp, key=lambda r: r.rank)] == [1, 2, 3]
    # nearest neighbor stays inside the community
    top = {q: min(grp, key=lambda r: r.rank).neighbor_id for q, grp in by_q.items()}
    assert top[3] in a and top[103] in b
