"""Duplicate-span removal — exact substring-level dedup across the corpus
(Lee et al. 2022, "Deduplicating training data makes language models
better" — public knowledge: repeated 50-token substrings are memorization
fuel even when whole documents differ; CCNet/RefinedWeb remove repeated
spans, not just repeated documents).

Formulation: every ``width``-token window (stride 1) is hashed; a window
text occurring ``min_count``+ times corpus-wide is a duplicated span. The
CANONICAL occurrence — smallest (doc_id, position) — is kept; every other
occurrence's tokens are removed from their documents (keep-first, the
same policy as engine/dedup.paragraph_dedup). Lee et al. build suffix
arrays to find maximal repeats; fixed-width windows are the standard
map-reduce-friendly approximation (every repeat >= width tokens is
caught; shorter ones are deliberately out of scope — stated, not
hidden).

Scale shape — three corpus passes, all linear with small constants:

1. window hashing: pure array expressions (transform over a sequence +
   slice + sha2) — NO explode until the (doc_id, pos, hash) fact table,
   which is exactly n_tokens rows per doc. The hash input re-reads each
   token ``width`` times (the O(n·w) bytes the suffix array avoids); at
   width 20 that is a ~20x CPU constant on one pass, the documented
   trade for a shuffle-free windowing step.
2. duplicate finding: one partial-aggregable groupBy on the window hash
   (count + min-struct canonical) — the only corpus-wide shuffle.
3. rebuild: non-canonical duplicate positions fold back per doc as ONE
   array column (collect_list), and the surviving text is a pure
   filter-with-index array expression — no token explode, no UDF.

sha256 window hashes make collisions (wrongly-merged spans) negligible;
the fact table carries the hash only, never the window text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col):
    return F.split(F.trim(text_col), r"\s+")


def window_occurrences(
    docs: DataFrame, width: int = 20, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, whash) — one row per width-token window (stride 1).
    Documents shorter than ``width`` tokens emit no rows (a span shorter
    than the window is out of scope by definition)."""
    if width < 2:
        raise ValueError(f"width must be >= 2 tokens, got {width}")
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    hashes = F.transform(
        F.sequence(F.lit(0), n - width),
        # space-joined: tokens are whitespace-split (no internal spaces),
        # so the join is boundary-unambiguous ("ab c" != "a bc")
        lambda i: F.sha2(
            F.concat_ws(" ", F.slice(toks, i + 1, width)), 256
        ),
    )
    return (
        docs.filter(n >= width)
        .select("doc_id", F.posexplode(hashes).alias("pos", "whash"))
    )


def duplicated_spans(
    occ: DataFrame, min_count: int = 2
) -> DataFrame:
    """(doc_id, pos) of every NON-CANONICAL occurrence of a window whose
    corpus-wide count >= min_count. Canonical = min (doc_id, pos) — the
    kept copy. One groupBy (count + min-struct) + one join back."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    stats = occ.groupBy("whash").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("doc_id", "pos")).alias("canon"),
    ).filter(F.col("n") >= min_count)
    return (
        occ.join(stats, "whash")
        .filter(
            (F.col("doc_id") != F.col("canon.doc_id"))
            | (F.col("pos") != F.col("canon.pos"))
        )
        .select("doc_id", "pos")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    width: int = 20,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text, n_tokens_removed) — corpus with every non-canonical
    duplicated span's tokens removed (keep-first). Overlapping duplicate
    windows merge naturally through coverage; a token survives iff no
    removed window covers it. Whitespace is normalized to single spaces
    (the window tokenization already erased the original runs)."""
    spans = (
        duplicated_spans(
            window_occurrences(docs, width, text_col), min_count
        )
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("dup_pos"))
    )
    toks = _tokens(F.col(text_col))
    dup = F.coalesce(F.col("dup_pos"), F.array().cast("array<int>"))
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            dup, lambda p: (p <= i) & (i < p + F.lit(width))
        ),
    )
    return (
        docs.join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(" ", kept).alias(text_col),
            (F.size(toks) - F.size(kept)).alias("n_tokens_removed"),
        )
    )
