"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the designs assume 10^9+ documents):

- exact: hash-groupBy; partial aggregation absorbs duplicate skew.
- MinHash+LSH: shingle -> K seeded xxhash64 mins (one groupBy, K partial-agg
  min columns — no per-row Python) -> band buckets -> pair generation only
  within buckets (the quadratic step is capped per bucket and logged, same
  policy as derive.cooccur). Candidates then get an exact signature-overlap
  estimate via one self-join on doc id.
- SimHash: 64-bit signature from token-hash bit votes, computed with an
  Arrow pandas UDF (numpy bit ops; per-row Python is banned); near-dup pairs
  found by the 4x16-bit band trick (Hamming <= 3 guaranteed recall for
  distance <= 3).
- n-gram Jaccard: exact verify step for candidate pairs (shared-shingle
  count / union) — run on LSH candidates, never all-pairs.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

log = logging.getLogger("verum_spark.dedup")

BUCKET_CAP = 64  # max docs per LSH bucket before the bucket is dropped


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(h, n_docs, keep_id): sha256 content groups with >1 member."""
    return (
        docs.select(F.sha2("text", 256).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the min doc_id per exact content hash (deterministic winner)."""
    keep = (
        docs.select(F.sha2("text", 256).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def _shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh) word n-gram shingles; docs shorter than n words emit the
    whole normalized text as one shingle."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    toks = F.split(F.trim(norm), " ")
    base = docs.select("doc_id", toks.alias("toks"))
    sh = F.when(
        F.size("toks") >= n,
        F.expr(
            f"transform(sequence(0, size(toks) - {n}), "
            f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("toks"))))
    return base.select("doc_id", F.explode(sh).alias("sh")).distinct()


def minhash_signatures(docs: DataFrame, k: int = 16, shingle_n: int = 3) -> DataFrame:
    """(doc_id, h0..h{k-1}) — k seeded-xxhash64 min-hashes over shingles.
    One partial-aggregable groupBy; K is a column count, not a row blowup."""
    sh = _shingles(docs, shingle_n)
    aggs = [F.min(F.xxhash64("sh", F.lit(s))).alias(f"h{s}") for s in range(k)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_candidates(
    docs: DataFrame, k: int = 16, bands: int = 4, shingle_n: int = 3,
    bucket_cap: int = BUCKET_CAP, log_dropped: bool = False,
) -> DataFrame:
    """(a, b, est_jaccard) candidate near-dup pairs from banded MinHash.

    est_jaccard = fraction of matching signature components (unbiased
    MinHash estimate). Buckets above ``bucket_cap`` are dropped and counted
    — same no-silent-caps policy as co-occurrence derivation.
    """
    rows_per_band = k // bands
    sig = minhash_signatures(docs, k, shingle_n).persist()
    sig_cols = [f"h{i}" for i in range(k)]

    band_exprs = []
    for b in range(bands):
        cols = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        band_exprs.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.bh")

    grouped = (
        buckets.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .withColumn("n", F.size("ids"))
        .filter(F.col("n") >= 2)
    )
    if log_dropped:
        dropped = grouped.filter(F.col("n") > bucket_cap).count()
        if dropped:
            log.warning("minhash: dropped %d over-cap LSH buckets (cap=%d)",
                        dropped, bucket_cap)
    pairs = (
        grouped.filter(F.col("n") <= bucket_cap)
        .select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode(F.filter("ids", lambda x: x > F.col("a"))).alias("b"))
        .distinct()
    )

    sa = sig.select(F.col("doc_id").alias("a"), *[F.col(c).alias(f"a_{c}") for c in sig_cols])
    sb = sig.select(F.col("doc_id").alias("b"), *[F.col(c).alias(f"b_{c}") for c in sig_cols])
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in sig_cols
    )
    return (
        pairs.join(sa, "a").join(sb, "b")
        .select("a", "b", F.round(matches / F.lit(float(k)), 4).alias("est_jaccard"))
    )


@pandas_udf(LongType())
def _simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash: sum of +-1 bit votes from per-token blake2b hashes.
    Arrow-vectorized batch; numpy does the bit unpacking."""
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        toks = (t or "").lower().split()
        if not toks:
            continue
        votes = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in toks:
            h = np.uint64(
                int.from_bytes(
                    hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
                    "big",
                )
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            votes += 2 * bits - 1
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        out[i] = np.int64(np.uint64(sig).astype(np.int64))
    return pd.Series(out)


def simhash_signatures(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", _simhash64(F.col("text")).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) <= max_hamming, found via
    the 4x16-bit band pigeonhole (distance <=3 -> at least one band equal)."""
    sig = simhash_signatures(docs).persist()
    chunks = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(f"c{i}")
        for i in range(4)
    ]
    s = sig.select("doc_id", "simhash", *chunks)
    cands = None
    for i in range(4):
        a = s.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"), F.col(f"c{i}").alias("key"))
        b = s.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"), F.col(f"c{i}").alias("key"))
        p = a.join(b, "key").filter(F.col("a") < F.col("b")).select("a", "b", "sa", "sb")
        cands = p if cands is None else cands.unionByName(p)
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cands.distinct()
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, candidates: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Exact Jaccard over word n-gram sets for given (a, b) candidate pairs —
    the verify step after LSH. Shared count via shingle join, union by
    inclusion-exclusion; never materializes all-pairs."""
    sh = _shingles(docs, shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id").alias("a"), "sh")
    sb = sh.select(F.col("doc_id").alias("b"), "sh")
    shared = (
        candidates.join(sa, "a").join(sb, ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .select(
            "a", "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )
