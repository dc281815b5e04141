"""End-to-end corpus curation — the composed LLM-training-data pipeline.

One call chains the engine's text operators in the order the public
pipelines run them (C4 / CCNet / RefinedWeb / Dolma practice):

    normalize -> C4 line rules -> language ID -> quality score ->
    exact dedup -> MinHash near-dup dedup [-> chunking]

Every stage is an operator this repo already tests in isolation
(engine/text.py, engine/dedup.py, engine/chunking.py); this module owns
only the composition, the stage ORDER (normalize before hashing so
whitespace variants dedup exactly; dedup after filtering so the LSH pass
runs on the smallest candidate set), and the funnel report.

Scale notes: with ``collect_stats=True`` (default) every stage is
materialized through an eager localCheckpoint and the previous stage's
blocks are released — the funnel count is a scan of real rows and each
downstream stage plans against a flat leaf instead of the whole upstream
expression stack (lang-ID alone is a ~1000-node codegen tree; without
the cut, every later action re-optimizes and re-executes all of it).
The RETURNED DataFrame is then a caller-owned checkpoint whose blocks
live until the reference is dropped (ContextCleaner reclaims on GC —
the dedup._seal lifetime contract; unpersist() is a no-op on
checkpoints). ``collect_stats=False`` adds no per-stage actions or
checkpoints of its own — but the call is still not fully lazy: the
MinHash stage internally persists/checkpoints its signature table
(dedup._seal) and near-dup clustering runs the iterative
connected-components loop, both eager by design. The dedup
joins are left-semi/anti against O(duplicates) key sets either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.chunking import chunk_documents
from engine.dedup import dedup_corpus, exact_dedup, minhash_candidates
from engine.text import clean_lines, lang_id, normalize_text, quality_score


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    chunk_size: int | None = None,
    chunk_stride: int | None = None,
    unicode_form: str | None = "NFC",
    collect_stats: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """(curated, funnel) — ``docs`` (doc_id, text, ...) curated for
    training; ``funnel`` maps stage name -> surviving doc count (empty
    when ``collect_stats=False``).

    ``keep_langs``: empty tuple disables the language gate.
    ``min_quality``: 0 disables the quality gate.
    ``jaccard_threshold``: MinHash candidate pairs at or above this
    estimated Jaccard are clustered and deduplicated to one survivor.
    ``chunk_size``: when set, the output is chunk rows (chunk_documents)
    instead of whole documents.
    """
    funnel: dict[str, int] = {}
    prev_ck: list[DataFrame] = []

    def note(name: str, df: DataFrame) -> DataFrame:
        # With stats on, each stage is MATERIALIZED (eager localCheckpoint)
        # and the previous stage's blocks released: the count is a scan of
        # real rows, and — just as important — every downstream stage plans
        # against a flat leaf instead of the whole upstream expression
        # tree. Without this, each later count() re-optimizes and
        # re-executes an ever-deeper stack of wide codegen projections
        # (lang-ID alone is a ~1000-node expression): measured 27 min ->
        # ~6 min on the test suite. The LAST stage's checkpoint belongs
        # to the caller (blocks free when the reference drops). With
        # collect_stats=False this function adds no materialization.
        if not collect_stats:
            return df
        df = df.localCheckpoint(eager=True)
        funnel[name] = df.count()
        if prev_ck:
            # Dropping the reference is the release: unpersist() is a
            # no-op on a localCheckpoint'ed Dataset (CacheManager never
            # registered the checkpoint RDD) — ContextCleaner reclaims
            # the blocks once the previous stage's DataFrame is GC'd,
            # the same lifetime contract as dedup._seal.
            prev_ck.pop()
        prev_ck.append(df)
        return df

    if collect_stats:
        funnel["input"] = docs.count()
    cur = note(
        "normalized",
        normalize_text(docs, unicode_form=unicode_form),
    )
    cur = note("c4_lines", clean_lines(cur))
    if keep_langs:
        langs = lang_id(cur).filter(F.col("lang_pred").isin(list(keep_langs)))
        cur = note("lang", cur.join(langs.select("doc_id"), "doc_id", "semi"))
    if min_quality > 0:
        good = quality_score(cur).filter(F.col("quality") >= min_quality)
        cur = note("quality", cur.join(good.select("doc_id"), "doc_id", "semi"))
    cur = note("exact_dedup", exact_dedup(cur))
    pairs = minhash_candidates(cur).filter(
        F.col("est_jaccard") >= jaccard_threshold
    )
    cur = note("near_dedup", dedup_corpus(spark, cur, pairs))
    if chunk_size is not None:
        cur = note("chunks", chunk_documents(cur, chunk_size, chunk_stride))
    return cur, funnel
