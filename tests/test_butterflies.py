"""Butterfly counting vs a brute-force 4-cycle oracle.

Oracle: enumerate all same-side pairs via itertools over the neighbor
sets — exact, O(V^2) — fine at fixture scale, which is the point of the
distributed implementation.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from engine.algos.butterflies import butterflies


def _brute(edge_list):
    """(total, per_left, per_right) by direct pair enumeration."""
    nl: dict = {}
    nr: dict = {}
    for u, r in set(edge_list):
        nl.setdefault(u, set()).add(r)
        nr.setdefault(r, set()).add(u)
    total = 0
    per_left = {u: 0 for u in nl}
    per_right = {r: 0 for r in nr}
    for u1, u2 in combinations(sorted(nl), 2):
        c = len(nl[u1] & nl[u2])
        bf = c * (c - 1) // 2
        total += bf
        per_left[u1] += bf
        per_left[u2] += bf
        for r in nl[u1] & nl[u2]:
            per_right[r] += c - 1
    return total, per_left, per_right


def _mk_edges(spark, pairs):
    return spark.createDataFrame(
        [(f"L{u}", f"R{r}") for u, r in pairs], "src string, dst string"
    )


CASES = [
    # complete bipartite K_{3,4}: C(3,2)*C(4,2) = 18 butterflies
    [(u, r) for u in range(3) for r in range(4)],
    # path (no butterflies)
    [(0, 0), (1, 0), (1, 1), (2, 1)],
    # two disjoint squares + a pendant
    [(0, 0), (0, 1), (1, 0), (1, 1), (2, 2), (2, 3), (3, 2), (3, 3), (4, 9)],
    # hub right vertex shared by 5 lefts + partial overlaps
    [(u, 0) for u in range(5)] + [(0, 1), (1, 1), (2, 2), (3, 2), (0, 2)],
]


@pytest.mark.parametrize("pairs", CASES)
def test_total_matches_brute_force(spark, pairs):
    want, _, _ = _brute(pairs)
    res = butterflies(spark, _mk_edges(spark, pairs))
    assert res.total == want
    assert res.centers_skipped == 0


def test_complete_bipartite_closed_form(spark):
    a, b = 4, 5
    pairs = [(u, r) for u in range(a) for r in range(b)]
    res = butterflies(spark, _mk_edges(spark, pairs))
    assert res.total == (a * (a - 1) // 2) * (b * (b - 1) // 2)


def test_per_vertex_credits(spark):
    pairs = CASES[3]
    want_total, per_l, per_r = _brute(pairs)
    res = butterflies(spark, _mk_edges(spark, pairs), per_vertex=True)
    assert res.total == want_total
    got = {(r["side"], r["vid"]): r["butterflies"] for r in res.per_vertex.collect()}
    # side labels refer to input columns: src = left, dst = right
    for u, n in per_l.items():
        assert got[("src", f"L{u}")] == n, f"L{u}"
    for r, n in per_r.items():
        assert got[("dst", f"R{r}")] == n, f"R{r}"
    # every butterfly has exactly 2 corners in each layer
    assert sum(per_l.values()) == 2 * want_total
    assert sum(per_r.values()) == 2 * want_total


def test_duplicate_edges_collapse(spark):
    pairs = CASES[0]
    dup = pairs + pairs[:5]
    res = butterflies(spark, _mk_edges(spark, dup))
    assert res.total == _brute(pairs)[0]


def test_side_selection_prefers_cheaper_wedges(spark):
    # one hub RIGHT vertex of degree 20 -> wedging at dst costs C(20,2);
    # every LEFT vertex has degree <= 2 -> wedging at src costs <= 20.
    pairs = [(u, 0) for u in range(20)] + [(u, u + 1) for u in range(20)]
    res = butterflies(spark, _mk_edges(spark, pairs))
    assert res.wedged_side == "src"
    assert res.total == 0  # no two lefts share two rights here
    assert res.wedge_cost <= 20


def test_hub_cap_is_loud_lower_bound(spark):
    # K_{3,4} plus an over-cap hub on EACH side (side selection may pick
    # either): right hub r9 over 6 extra lefts, left hub u20 over r0..r8.
    pairs = [(u, r) for u in range(3) for r in range(4)]
    pairs += [(10 + i, 9) for i in range(6)]
    pairs += [(20, r) for r in range(9)]
    full = butterflies(spark, _mk_edges(spark, pairs))
    capped = butterflies(spark, _mk_edges(spark, pairs), max_center_degree=4)
    assert full.centers_skipped == 0
    assert capped.centers_skipped >= 1
    assert capped.total <= full.total
    assert full.total == _brute(pairs)[0]


def test_cap_contract(spark):
    with pytest.raises(ValueError, match="max_center_degree"):
        butterflies(spark, _mk_edges(spark, CASES[0]), max_center_degree=1)


def test_on_derived_repo_path_layer(spark, tiny_graph):
    """The real use: the repo->path layer of the derived graph. Check
    against brute force on the collected layer (fixture scale)."""
    _, e = tiny_graph
    from pyspark.sql import functions as F

    layer = e.filter(F.col("rel") == "repo_path").select("src", "dst")
    pairs = [(r["src"], r["dst"]) for r in layer.collect()]
    want, _, _ = _brute(pairs)
    res = butterflies(spark, layer)
    assert res.total == want
