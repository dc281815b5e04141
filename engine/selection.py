"""Data selection by importance resampling (DSIR-style) — pick raw-pool
documents that look like a trusted target corpus.

Public semantics: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" (DSIR): fit cheap generative models of the
TARGET distribution (trusted corpus) and the SOURCE distribution (the
raw pool), weight every pool document by the log-likelihood ratio
log p_target(x) - log p_source(x), and sample without replacement with
probability proportional to exp(logw / T) via the Gumbel top-k trick
(Vieira 2014; Kool et al. 2019, "Stochastic Beams and Where to Find
Them"): key_i = logw_i / T + Gumbel_i, take the k largest keys.

This implementation uses the engine's stupid-backoff n-gram LM
(engine/lm.py) as the generative model on both sides — heavier-tailed
than DSIR's hashed bag-of-ngrams multinomial but trained/scored with
the same two-shuffle distributed machinery the perplexity filter
already exercises, so the whole selection is: two LM scorings, one
join, one TakeOrderedAndProject. The Gumbel noise is a deterministic
hash transform of (doc_id, salt) — bit-stable under any partitioning,
resume, or rerun (the repo's sampling contract, engine/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.lm import NGramLM, score_perplexity

_U_BITS = 52  # uniform from the top 52 hash bits: exact in a double


def importance_weights(
    docs: DataFrame, target_lm: NGramLM, source_lm: NGramLM
) -> DataFrame:
    """(doc_id, logw, logw_per_token, n_events): the DSIR log importance
    ratio per document. ``logw_per_token`` divides by the event count —
    use it when the two LMs' length biases should cancel (long documents
    otherwise dominate the raw sum in either direction)."""
    t = score_perplexity(docs, target_lm).select(
        "doc_id", F.col("logprob").alias("lp_t"), "n_events"
    )
    s = score_perplexity(docs, source_lm).select(
        "doc_id", F.col("logprob").alias("lp_s")
    )
    return t.join(s, "doc_id").select(
        "doc_id",
        (F.col("lp_t") - F.col("lp_s")).alias("logw"),
        ((F.col("lp_t") - F.col("lp_s")) / F.col("n_events")).alias(
            "logw_per_token"
        ),
        "n_events",
    )


def _gumbel(col, salt: str):
    """Deterministic standard Gumbel from a hash of ``col``: u in (0,1)
    from the hash's low 52 bits (offset half a ULP so u is never 0 or
    1), g = -log(-log(u))."""
    u = (
        F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1 << _U_BITS))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << _U_BITS))
    return -F.log(-F.log(u))


def importance_resample(
    docs: DataFrame,
    target_lm: NGramLM,
    source_lm: NGramLM,
    k: int,
    temperature: float = 1.0,
    per_token: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """The ``k`` selected documents (all doc columns + logw + gumbel_key),
    sampled without replacement with probability proportional to
    exp(logw / temperature) — Gumbel top-k. ``temperature -> 0`` is the
    deterministic argmax-k of logw; large temperatures flatten toward
    uniform. ``per_token`` selects on the length-normalized ratio.

    The global top-k is a TakeOrderedAndProject (per-partition heaps,
    one k-row driver merge) — no full sort materializes at scale.
    """
    if k < 1:
        raise ValueError(f"importance_resample: k must be >= 1, got {k}")
    if temperature < 0:
        raise ValueError(
            f"importance_resample: temperature must be >= 0, got {temperature}"
        )
    # The LM scorer skips empty/NULL texts, so an unscoreable doc would
    # silently vanish from the joins and the selection could come back
    # SHORT of k with no signal — fail loudly instead (the caller decides
    # how to pre-filter; one cheap metadata-only pass).
    n_bad = docs.filter(
        F.col("text").isNull() | (F.length(F.trim("text")) == 0)
    ).count()
    if n_bad:
        raise ValueError(
            f"importance_resample: {n_bad} documents have empty/NULL text "
            "and cannot be LM-scored — filter them out explicitly first"
        )
    w = importance_weights(docs, target_lm, source_lm)
    score = F.col("logw_per_token") if per_token else F.col("logw")
    if temperature == 0:
        key = score  # argmax-k limit: no noise at all
    else:
        key = score / F.lit(temperature) + _gumbel(F.col("doc_id"), salt)
    keyed = w.select("doc_id", "logw", "logw_per_token", key.alias("gumbel_key"))
    return (
        docs.join(keyed, "doc_id")
        .orderBy(F.col("gumbel_key").desc(), F.col("doc_id").asc())
        .limit(k)
    )
