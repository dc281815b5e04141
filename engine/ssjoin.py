"""Exact threshold set-similarity self-join (prefix-filtered Jaccard).

The EXACT counterpart of the MinHash/SimHash candidate generators in
engine/dedup.py: every pair of documents with Jaccard(tokens_a, tokens_b)
>= threshold is returned — no probabilistic recall, no banding miss rate.
The classical trade: MinHash prices recall for a signature-sized shuffle;
this operator guarantees recall and prices it with a prefix-token join.
Both share the verify arithmetic, so a user can A/B the two pipelines on
the same corpus and measure the recall the sketch actually loses.

Algorithm — the distributed prefix-filter family (Chaudhuri, Ganti &
Kaushik, ICDE 2006 "A Primitive Operator for Similarity Joins"; Xiao,
Wang, Lin & Yu, WWW 2008 "Efficient Similarity Joins for Near Duplicate
Detection" [PPJoin]; Vernica, Carey & Li, SIGMOD 2010 "Efficient
Parallel Set-Similarity Joins Using MapReduce"):

1. **Global token order** by ascending document frequency (rarest
   first), ties by token value. No global row_number is materialized —
   the pair (df, token) IS the sort key, so ordering a doc's tokens is
   `array_sort(collect_list(struct(df, tok)))`: partial-aggregable,
   shuffle-free beyond the one df groupBy.
2. **Prefix filter**: two sets with Jaccard >= t must share a token in
   their first p = |s| - ceil(t*|s|) + 1 tokens of that order. Only
   prefix tokens are exploded, and by construction they are the RAREST
   tokens in the corpus — the hot-key blowup of a naive token self-join
   is priced away by the ordering itself, not by a cap.
3. **Candidate join** on the prefix token with id_a < id_b, pruned
   in-join by the length filter (min size >= t * max size) and the
   PPJoin position filter (overlap upper bound from the matched prefix
   positions vs the minimum overlap ceil(t/(1+t) * (|a|+|b|))).
4. **Exact verify**: `array_intersect` of the full ordered token
   arrays -> jaccard = inter / (|a| + |b| - inter) >= t. All codegen;
   no Python in any hot path.

Float-boundary discipline: the PRUNING inequalities use an epsilon
slack (a few extra candidates can pass; none can be lost), and only
the final verify compares `inter/union >= threshold` — the same IEEE
division an oracle performs, so results match an exact re-computation
bit-for-bit. This is what makes "exact" honest at thresholds like 0.8
that are not representable in binary.

Scale notes (10^9 docs): the df groupBy and the per-doc sort are one
partial-agg pass each; prefix emission is size - ceil(t*size) + 1 rows
per doc (t=0.8 -> ~20% of tokens, the rare ones); the candidate join
shuffles (token, id, size, pos) tuples keyed by rare tokens; verify
joins carry doc-sized arrays only for surviving candidates. A
pathological corpus (10^6 identical docs) concentrates C(10^6, 2)
TRUE pairs — no exact algorithm can emit fewer rows than its answer;
run exact_dedup (engine/dedup.py) first, as the curation pipeline does.
``max_token_docs`` optionally drops prefix tokens appearing in more
docs than the cap — counted and logged loudly, and the result is then
a documented RECALL LOWER BOUND (the no-silent-caps policy of
derive.cooccur); default None keeps the exact contract.

Verum parity: extends the reference's C1 similarity family (SURVEY.md
Table A) with the exact-recall member; the reference's NetworkX-era
code has no set-similarity join at all.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger("verum_spark.ssjoin")

_EPS = 1e-9  # RELATIVE pruning slack: never lose a boundary pair to IEEE
# rounding. The double rounding error of size*t grows with the operand
# (ulp ~2e-9 at 1e7), so the slack is scaled by the size term it guards
# (ADVICE r5) — valid as long as _EPS * size < 1, i.e. sizes below 1e9,
# comfortably past any real token set. Over-slack is recall-safe: it can
# only lengthen the prefix / lower the candidate bars, and the final
# verify is exact set arithmetic.


def jaccard_join_sets(
    tokens: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    token_col: str = "tok",
    max_token_docs: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """(a, b, inter, size_a, size_b, jaccard) for every id pair whose
    DISTINCT-token Jaccard >= threshold, a < b.

    ``tokens`` holds (id, token) memberships; duplicates collapse, NULL
    tokens are ignored (a NULL is not a set element). Ids must be
    orderable (the pair is canonicalized a < b).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"jaccard_join_sets: threshold must be in (0, 1], got {threshold}"
        )
    t = float(threshold)
    toks = (
        tokens.filter(F.col(token_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(token_col).alias("tok"))
        .distinct()
    )

    # Document frequency -> the global rarest-first total order (df, tok).
    df_tbl = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if max_token_docs is not None:
        n_hot = df_tbl.filter(F.col("df") > max_token_docs).count()
        if n_hot and log_dropped:
            log.warning(
                "jaccard_join_sets: %d tokens over max_token_docs=%d excluded "
                "from prefixes — result is a recall LOWER BOUND",
                n_hot, max_token_docs,
            )

    # ordered feeds three consumers (prefix emission + both verify
    # sides): persist once, release via _seal — the dedup module's
    # no-outliving-persists policy (engine/dedup.py::_seal).
    ordered = (
        toks.join(df_tbl, "tok")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "tok"))
            ).alias("otoks"),
            F.count(F.lit(1)).alias("size"),
        )
        .persist()
    )

    # Prefix length p = size - ceil(t*size) + 1, epsilon-slacked so an
    # exactly-representable boundary (t*size integral) never over-ceils.
    p = (
        F.col("size")
        - F.ceil(
            F.col("size") * F.lit(t) - F.lit(_EPS) * F.col("size")
        ).cast("int")
        + F.lit(1)
    )
    prefix = ordered.select(
        "id",
        "size",
        F.posexplode(F.slice("otoks", 1, p)).alias("pos", "entry"),
    )
    if max_token_docs is not None:
        prefix = prefix.filter(F.col("entry.df") <= max_token_docs)
    prefix = prefix.select(
        "id", "size", "pos", F.col("entry.tok").alias("tok")
    )

    # Candidate pairs: equi-join on the prefix token; length filter and
    # PPJoin position filter ride in the join condition (both slacked).
    a = prefix.select(
        F.col("id").alias("a"), F.col("size").alias("size_a"),
        F.col("pos").alias("pos_a"), "tok",
    )
    b = prefix.select(
        F.col("id").alias("b"), F.col("size").alias("size_b"),
        F.col("pos").alias("pos_b"), "tok",
    )
    min_overlap = F.ceil(
        (F.col("size_a") + F.col("size_b")) * F.lit(t / (1.0 + t))
        - F.lit(_EPS) * (F.col("size_a") + F.col("size_b"))
    )
    pos_ubound = F.lit(1) + F.least(
        F.col("size_a") - F.col("pos_a") - F.lit(1),
        F.col("size_b") - F.col("pos_b") - F.lit(1),
    )
    cand = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.least("size_a", "size_b")
            >= F.greatest("size_a", "size_b")
            * F.lit(t)
            - F.lit(_EPS) * F.greatest("size_a", "size_b")
        )
        .filter(pos_ubound >= min_overlap)
        .select("a", "b")
        .distinct()
    )

    # Exact verify on the full ordered arrays (sizes re-ride with them).
    arrs = ordered.select("id", "otoks", "size")
    inter = F.size(F.array_intersect("ta", "tb"))
    verified = (
        cand.join(
            arrs.select(
                F.col("id").alias("a"),
                F.col("otoks").alias("ta"),
                F.col("size").alias("size_a"),
            ),
            "a",
        )
        .join(
            arrs.select(
                F.col("id").alias("b"),
                F.col("otoks").alias("tb"),
                F.col("size").alias("size_b"),
            ),
            "b",
        )
        .select(
            "a", "b", "size_a", "size_b", inter.alias("inter"),
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= F.lit(t))
        .select("a", "b", "inter", "size_a", "size_b", "jaccard")
    )
    from engine.dedup import _seal

    return _seal(verified, ordered)


def jaccard_join(
    docs: DataFrame,
    threshold: float,
    shingle_n: int = 3,
    max_token_docs: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Exact near-dup pairs of a (doc_id, text) corpus: word-``shingle_n``-gram
    Jaccard >= threshold, via :func:`jaccard_join_sets` over the SAME
    shingle family as MinHash (engine/dedup.py::_shingles) — so the exact
    result is the ground truth for ``minhash_candidates`` recall."""
    from engine.dedup import _shingles

    sh = _shingles(docs, shingle_n)
    return jaccard_join_sets(
        sh, threshold, id_col="doc_id", token_col="sh",
        max_token_docs=max_token_docs, log_dropped=log_dropped,
    )
