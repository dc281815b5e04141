"""Distributed n-gram language model with stupid-backoff scoring.

The perplexity quality filter of a web-scale training-data pipeline
(CCNet / LLaMA / RedPajama practice: score every document with a small
LM trained on a trusted corpus, drop the high-perplexity tail). The
smoothing is *stupid backoff* (Brants et al. 2007, "Large Language
Models in Machine Translation" — the scheme invented FOR distributed
MapReduce-style LMs precisely because it needs only raw counts, no
discount renormalization pass):

    S(w | ctx_k) = count(ctx_k w) / count(ctx_k)      if count > 0
                 = alpha * S(w | ctx_{k-1})           otherwise
    S(w)         = count(w) / N                        (base case)

Spark shape — everything is codegen'd array expressions, no UDF:

* **Training** is one explode of all gram orders 1..n over the padded
  token stream into ONE partial-aggregated groupBy: counts combine
  map-side, the shuffle carries one partial row per (partition, gram),
  not one per occurrence — the same discipline as ``ngram_vocab``. The
  model IS a DataFrame keyed by the space-joined gram string (a k-token
  gram can never collide with a j-token gram, so the string key alone
  is unique across orders).
* **Scoring** needs, per token event, 2n-1 lookups (the order-k gram,
  its order-(k-1) context, ... down to the unigram). Rather than 2n-1
  joins, the events are MELTED to one (event, role, gram) stream and
  joined ONCE against the count table, then folded back with one
  partial-agg groupBy — at 100 TB that is a single shuffle whose volume
  is (2n-1)x the token count, the irreducible lookup work. Hub grams
  ("the", "<s> <s>") are single build-side rows with many probe rows —
  the shape AQE's skew-join split handles; nothing accumulates per key
  beyond the max/first fold.

Boundary/OOV contract (mirrored exactly by the pure-python test oracle):
docs are padded with n-1 ``<s>`` and one ``</s>``; every real token and
the ``</s>`` is a scored event (the pads are context only, never
events); N is the TOTAL padded unigram count (pads included — a uniform
scale on the base case, irrelevant to ranking, kept because it makes
numerator/denominator come from one consistent stream); an event whose
word is out-of-vocabulary scores ``alpha^(n-1) * (1/N)`` (unseen word ~
count-1 unigram under full backoff). Perplexity is ``exp(-logprob /
n_events)`` in nats.

Beyond the reference surface (Verum has no text ops) — SURVEY.md §2
round-4 addendum.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"
EOS = "</s>"


@dataclass
class NGramLM:
    """grams: (gram string, k tinyint, cnt long) for orders 1..n.

    ``grams`` is eagerly localCheckpoint'ed by ``train_ngram_lm`` — its
    blocks are tied to this DataFrame's lifetime (ContextCleaner reclaims
    them when the model is garbage-collected), so holding many models
    never pins unreleasable cache (the repo's no-outliving-persists
    policy)."""

    grams: DataFrame
    n: int
    alpha: float
    lowercase: bool
    total_tokens: int  # N: padded unigram occurrences (pruning-independent)
    vocab_size: int  # distinct unigrams surviving min_count (incl. pads)


def _padded_tokens(text_col, n: int, lowercase: bool):
    t = F.lower(text_col) if lowercase else text_col
    toks = F.split(F.trim(t), r"\s+")
    return F.concat(
        F.array_repeat(F.lit(BOS), n - 1), toks, F.array(F.lit(EOS))
    )


def train_ngram_lm(
    docs: DataFrame,
    n: int = 3,
    alpha: float = 0.4,
    lowercase: bool = True,
    min_count: int = 1,
) -> NGramLM:
    """Count all gram orders 1..n over the padded corpus in one pass.

    ``min_count`` prunes the long tail BEFORE the model ever reaches a
    join (at 100 TB an unpruned trigram table of the open web is itself
    a large dataset). Pruning by count is backoff-consistent: every
    occurrence of an order-k gram contains its order-(k-1) context, so
    count(ctx) >= count(gram) and a surviving numerator always has a
    surviving denominator.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    padded = _padded_tokens(F.col("text"), n, lowercase)
    base = docs.filter(F.length("text") > 0).select(padded.alias("p"))

    def order_grams(k: int):
        # NB: the transform lambda must take exactly ONE argument — a
        # two-arg lambda is called as (element, index) by Spark's
        # higher-order functions, silently shadowing any default.
        return F.transform(
            F.sequence(F.lit(1), F.size("p") - F.lit(k - 1)),
            lambda i: F.array_join(F.slice("p", i, k), " "),
        )

    per_order = [
        base.select(
            F.explode(order_grams(k)).alias("gram"),
            F.lit(k).cast("tinyint").alias("k"),
        )
        for k in range(1, n + 1)
    ]
    u = per_order[0]
    for o in per_order[1:]:
        u = u.unionByName(o)
    grams = (
        u.groupBy("gram", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .localCheckpoint(eager=True)
    )
    # N is the TOTAL padded token mass, computed from the corpus itself —
    # deliberately independent of min_count (pruning the tail must not
    # inflate every unigram probability), and one cheap columnar scan.
    n_row = base.agg(F.sum(F.size("p")).alias("N")).collect()[0]
    if n_row.N is None:
        raise ValueError("train_ngram_lm: empty corpus (no non-empty docs)")
    vocab = grams.filter(F.col("k") == 1).count()
    return NGramLM(grams, n, alpha, lowercase, int(n_row.N), int(vocab))


def score_perplexity(docs: DataFrame, lm: NGramLM) -> DataFrame:
    """(doc_id, n_events, logprob, ppl) — stupid-backoff document scores.

    One melt (2n-1 lookup rows per event), one equi-join against the
    count table, one groupBy back to events, one groupBy to docs — two
    shuffles total beyond the join, both partial-aggregated.
    """
    n, alpha = lm.n, lm.alpha
    padded = _padded_tokens(F.col("text"), n, lm.lowercase)
    # one struct per event: the order-k suffix ending at position i
    # (role gk) and the order-k suffix ending at i-1 (role ck, the
    # backoff context), k = 1..n / 1..n-1
    fields = []
    for k in range(1, n + 1):
        fields.append((f"g{k}", k, 0))
    for k in range(1, n):
        fields.append((f"c{k}", k, 1))
    ev = (
        docs.filter(F.length("text") > 0)
        .select("doc_id", padded.alias("p"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(n), F.size("p")),
                    lambda i: F.struct(
                        (i - F.lit(n - 1)).alias("pos"),
                        *[
                            F.array_join(
                                F.slice("p", i - F.lit(k - 1 + back), k), " "
                            ).alias(role)
                            for role, k, back in fields
                        ],
                    ),
                )
            ).alias("e"),
        )
        .select("doc_id", "e.*")
    )
    melted = ev.select(
        "doc_id",
        "pos",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(role).alias("role"), F.col(role).alias("gram")
                    )
                    for role, _, _ in fields
                ]
            )
        ).alias("m"),
    ).select("doc_id", "pos", "m.role", "m.gram")
    counts = melted.join(
        lm.grams.select("gram", "cnt"), "gram", "left"
    ).groupBy("doc_id", "pos").agg(
        *[
            F.max(F.when(F.col("role") == role, F.col("cnt"))).alias(
                f"n_{role}"
            )
            for role, _, _ in fields
        ]
    )
    la = math.log(alpha)
    lN = F.log(F.lit(float(lm.total_tokens)))
    # when-chain from the highest order down: the first order whose
    # numerator survived min_count wins (its denominator is guaranteed,
    # see train_ngram_lm); a fully-unseen word hits the OOV floor.
    branches = F.when(
        F.col(f"n_g{n}").isNotNull(),
        F.log(F.col(f"n_g{n}")) - F.log(F.col(f"n_c{n-1}")),
    )
    for k in range(n - 1, 1, -1):
        branches = branches.when(
            F.col(f"n_g{k}").isNotNull(),
            F.lit(la * (n - k))
            + F.log(F.col(f"n_g{k}"))
            - F.log(F.col(f"n_c{k-1}")),
        )
    branches = branches.when(
        F.col("n_g1").isNotNull(),
        F.lit(la * (n - 1)) + F.log(F.col("n_g1")) - lN,
    ).otherwise(F.lit(la * (n - 1)) - lN)
    return (
        counts.select("doc_id", branches.alias("log_s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("log_s").alias("logprob"),
        )
        .select(
            "doc_id",
            "n_events",
            "logprob",
            F.exp(-F.col("logprob") / F.col("n_events")).alias("ppl"),
        )
    )


def perplexity_filter(
    docs: DataFrame, lm: NGramLM, max_ppl: float
) -> DataFrame:
    """Documents whose stupid-backoff perplexity is <= max_ppl (the CCNet
    head/middle cut). One semi join — the corpus pass stays columnar."""
    keep = score_perplexity(docs, lm).filter(F.col("ppl") <= max_ppl)
    return docs.join(keep.select("doc_id"), "doc_id", "semi")
