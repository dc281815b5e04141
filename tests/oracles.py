"""NetworkX-backed oracles for t2 algorithm parity (SURVEY.md §5.2).

The reference's own scorer delegated to networkx PageRank ([R
plugins/networkx.py::score_subgraph, reconstructed]), so NetworkX parity IS
reference-semantics parity. scipy is absent in this sandbox, so we call
networkx's pure-python implementation directly.
"""

from __future__ import annotations

import networkx as nx

try:  # nx >= 3.x private pure-python implementation (no scipy needed)
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
except ImportError:  # pragma: no cover
    _pagerank_python = None


def nx_digraph(vertex_ids, weighted_edges) -> nx.DiGraph:
    """Weighted simple digraph; parallel edges collapse by summing weight
    (the same collapse the engine's derivation performs)."""
    g = nx.DiGraph()
    g.add_nodes_from(vertex_ids)
    for s, d, w in weighted_edges:
        prev = g.get_edge_data(s, d, {"weight": 0.0})["weight"]
        g.add_edge(s, d, weight=prev + w)
    return g


def pagerank_oracle(g: nx.DiGraph, alpha=0.85, personalization=None) -> dict:
    assert _pagerank_python is not None, "nx pure-python pagerank unavailable"
    if g.number_of_nodes() == 0:
        return {}
    return _pagerank_python(
        g, alpha=alpha, personalization=personalization, tol=1e-14,
        max_iter=5000, weight="weight",
    )


def cc_oracle(g: nx.DiGraph) -> dict[int, int]:
    """vid -> min vid of its (undirected) component."""
    ug = g.to_undirected()
    out = {}
    for comp in nx.connected_components(ug):
        m = min(comp)
        for v in comp:
            out[v] = m
    for v in g.nodes():
        out.setdefault(v, v)
    return out


def triangles_oracle(g: nx.DiGraph) -> int:
    ug = nx.Graph(g.to_undirected())
    ug.remove_edges_from(nx.selfloop_edges(ug))
    return sum(nx.triangles(ug).values()) // 3


def khop_oracle(
    g: nx.DiGraph, vtypes: dict[int, str], seeds: list[int],
    max_depth: int, dont_follow: set[str],
) -> dict[int, int]:
    """vid -> BFS depth, undirected expansion, not expanding THROUGH
    dont_follow-typed vertices (they are included, never expanded)."""
    ug = g.to_undirected()
    depth = {s: 0 for s in seeds}
    frontier = [s for s in seeds if s in ug]
    for d in range(1, max_depth + 1):
        nxt = []
        for u in frontier:
            if vtypes.get(u) in dont_follow:
                continue
            for v in ug.neighbors(u):
                if v not in depth:
                    depth[v] = d
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return depth
