"""Motif (graph-pattern) queries compiled to relational joins.

Verum's Neo4j lineage implies Cypher-shaped context queries; the k-hop
BFS (`engine/algos/query.py`) covers reachability, this module covers
STRUCTURAL patterns — "find (a,b,c) with a->b, b->c and no a->c edge".
The public semantics model is GraphFrames' ``find()`` motif language
(Dave et al., GraphFrames 2016): a conjunction of edge atoms over named
vertex variables, with negated atoms allowed.

Pattern syntax (deliberately minimal): semicolon-separated atoms
``a->b``, negation ``!a->c``. Variables are bare identifiers; the
result has one ``<var>`` column per variable, distinct bindings (set
semantics — the edge table itself is set-semantic everywhere in this
engine).

Compilation — this is nothing but join planning, so Catalyst does the
heavy lifting:

* Atoms are ordered CONNECTED-FIRST (each next atom shares >=1 bound
  variable), so every step is an equi-join on bound variables, never a
  cartesian product; a disconnected pattern raises instead of silently
  exploding at 100 TB.
* An atom whose variables are both already bound contributes a LEFT
  SEMI join (edge-existence test — no fan-out), a negated atom a LEFT
  ANTI join; both run AFTER all binding joins so the anti never sees an
  unbound variable (raises otherwise).
* The growth frontier is |bindings|, the true output cardinality of the
  prefix pattern — the same reason GraphFrames/worst-case-optimal-join
  papers order by connectivity. No driver-side enumeration anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ATOM_RE = re.compile(
    r"^\s*(!?)\s*\(?\s*([A-Za-z_]\w*)\s*\)?\s*->\s*\(?\s*([A-Za-z_]\w*)\s*\)?\s*$"
)


def parse_pattern(pattern: str) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """-> (positive_atoms, negative_atoms), each a list of (src_var, dst_var)."""
    pos, neg = [], []
    atoms = [a for a in pattern.split(";") if a.strip()]
    if not atoms:
        raise ValueError("empty motif pattern")
    for a in atoms:
        m = _ATOM_RE.match(a)
        if not m:
            raise ValueError(
                f"bad motif atom {a.strip()!r} — expected 'a->b' or '!a->b'"
            )
        bang, u, v = m.groups()
        (neg if bang else pos).append((u, v))
    if not pos:
        raise ValueError("motif pattern needs at least one positive atom")
    return pos, neg


def motif_find(
    edges: DataFrame,
    pattern: str,
    distinct_vertices: bool = False,
) -> DataFrame:
    """Distinct variable bindings matching ``pattern`` over ``edges``
    (columns ``src``, ``dst``). ``distinct_vertices=True`` additionally
    requires all variables to bind DIFFERENT vertices (isomorphic-style
    matching; default is homomorphic, like GraphFrames)."""
    pos, neg = parse_pattern(pattern)
    neg_vars = {x for a in neg for x in a}
    pos_vars = {x for a in pos for x in a}
    missing = neg_vars - pos_vars
    if missing:
        raise ValueError(
            f"negated atoms use variables never bound by a positive atom: "
            f"{sorted(missing)}"
        )

    def atom_df(u: str, v: str) -> DataFrame:
        e = edges.select("src", "dst")
        if u == v:  # self-loop atom
            return e.filter(F.col("src") == F.col("dst")).select(
                F.col("src").alias(u)
            )
        return e.select(F.col("src").alias(u), F.col("dst").alias(v))

    # connected-first ordering over the positive atoms
    remaining = list(pos)
    ordered: list[tuple[str, str]] = [remaining.pop(0)]
    bound = set(ordered[0])
    while remaining:
        for i, (u, v) in enumerate(remaining):
            if u in bound or v in bound:
                ordered.append(remaining.pop(i))
                bound |= {u, v}
                break
        else:
            raise ValueError(
                f"disconnected motif pattern: atoms {remaining} share no "
                f"variable with {sorted(bound)} — a cartesian product; "
                f"split the pattern and cross-join deliberately if meant"
            )

    result: DataFrame | None = None
    seen: set[str] = set()
    for u, v in ordered:
        a = atom_df(u, v)
        avars = {u} if u == v else {u, v}
        if result is None:
            result = a
        else:
            shared = sorted(avars & seen)
            if avars <= seen:
                result = result.join(a, on=shared, how="semi")
                continue
            result = result.join(a, on=shared, how="inner")
        seen |= avars
    assert result is not None
    for u, v in neg:
        a = atom_df(u, v)
        on = [u] if u == v else [u, v]
        result = result.join(a, on=on, how="anti")
    if distinct_vertices:
        vs = sorted(seen)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                result = result.filter(F.col(vs[i]) != F.col(vs[j]))
    return result.select(*sorted(seen)).distinct()
