"""Reference implementation of the deterministic LPA spec (SURVEY.md §5.3).

Single-node, dict-based — intentionally a *different implementation shape*
from the engine's DataFrame version so agreement is meaningful. Spec:

  (a) undirected simple graph (parallel edges collapsed, self-loops dropped);
  (b) synchronous rounds;
  (c) new label = most frequent neighbor label, ties -> smallest label;
  (d) isolated vertices keep their own label;
  (e) stop on fixpoint, or on a 2-cycle (then take elementwise min of the
      two oscillating states), or at max_iter.
"""

from __future__ import annotations

from collections import Counter


def lpa_oracle(
    vertices: list[int], edges: list[tuple[int, int]], max_iter: int = 50
) -> dict[int, int]:
    nbrs: dict[int, set[int]] = {v: set() for v in vertices}
    for u, v in edges:
        if u == v:
            continue
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)

    labels = {v: v for v in nbrs}
    prev_states = [dict(labels)]
    for _ in range(max_iter):
        new = {}
        for v in nbrs:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs[v])
            top = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == top)
        if new == prev_states[-1]:
            return new
        if len(prev_states) >= 2 and new == prev_states[-2]:
            osc = prev_states[-1]
            return {v: min(new[v], osc[v]) for v in new}
        prev_states.append(new)
        if len(prev_states) > 3:
            prev_states.pop(0)
        labels = new
    return labels
