"""motif_find vs brute-force pattern enumeration.

The oracle enumerates every variable assignment over the vertex set and
checks each atom against the edge set — exponential but exact on the
test graphs, so any join-compilation error (ordering, semi vs inner,
anti placement, self-loops) is a set difference, not a statistic."""

from __future__ import annotations

import itertools
import random

import pytest

from engine.algos.motif import motif_find, parse_pattern


def _brute(edges, pattern_pos, pattern_neg, distinct=False):
    vs = sorted({x for e in edges for x in e})
    variables = sorted({x for a in pattern_pos + pattern_neg for x in a})
    es = set(edges)
    out = set()
    for combo in itertools.product(vs, repeat=len(variables)):
        b = dict(zip(variables, combo))
        if distinct and len(set(combo)) != len(combo):
            continue
        if all((b[u], b[v]) in es for u, v in pattern_pos) and not any(
            (b[u], b[v]) in es for u, v in pattern_neg
        ):
            out.add(combo)
    return out


def _rand_graph(seed=3, n=12, m=40, loops=2):
    rng = random.Random(seed)
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((a, b))
    for _ in range(loops):
        v = rng.randrange(n)
        es.add((v, v))
    return sorted(es)


PATTERNS = [
    "a->b",
    "a->b; b->c",
    "a->b; b->c; c->a",  # directed triangle
    "a->b; a->c",  # out-wedge
    "a->b; c->b",  # in-wedge
    "a->b; b->c; !a->c",  # open triad
    "a->b; b->a",  # reciprocal pair
    "a->a",  # self loop
    "a->b; b->b",  # loop on the far end
    "a->b; b->c; c->d; !a->d; !a->c",  # chain with two negations
    "a->b; b->c; a->c",  # both-bound semi atom (closed triad)
]


@pytest.mark.parametrize("pattern", PATTERNS)
@pytest.mark.parametrize("distinct", [False, True])
def test_matches_bruteforce(spark, pattern, distinct):
    edges = _rand_graph()
    e = spark.createDataFrame(edges, "src long, dst long")
    pos, neg = parse_pattern(pattern)
    variables = sorted({x for a in pos + neg for x in a})
    df = motif_find(e, pattern, distinct_vertices=distinct)
    assert df.columns == variables
    got = {tuple(r[v] for v in variables) for r in df.collect()}
    want = _brute(edges, pos, neg, distinct)
    assert got == want, f"{pattern}: {len(got)} vs {len(want)}"


def test_parse_and_contracts(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    assert parse_pattern("(a)-[]->(b)".replace("-[]->", "->")) == (
        [("a", "b")],
        [],
    )
    assert parse_pattern(" a->b ; !b->c ") == ([("a", "b")], [("b", "c")])
    with pytest.raises(ValueError, match="empty"):
        parse_pattern("  ;  ")
    with pytest.raises(ValueError, match="bad motif atom"):
        parse_pattern("a=>b")
    with pytest.raises(ValueError, match="positive atom"):
        motif_find(e, "!a->b")
    with pytest.raises(ValueError, match="never bound"):
        motif_find(e, "a->b; !a->z")
    with pytest.raises(ValueError, match="disconnected"):
        motif_find(e, "a->b; c->d")


def test_triangle_count_consistency(spark, tiny_graph):
    """Directed-triangle motifs on the derived graph agree with the
    dedicated triangle counter's semantics: each undirected triangle in
    the symmetrized graph appears as 6 homomorphic cyclic bindings."""
    from engine.algos.triangles import triangle_count

    _, e = tiny_graph
    und = e.selectExpr("src", "dst").union(e.selectExpr("dst as src", "src as dst"))
    m = motif_find(und, "a->b; b->c; c->a", distinct_vertices=True)
    n_tri = triangle_count(spark, e)
    assert m.count() == 6 * n_tri
