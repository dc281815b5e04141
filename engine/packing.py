"""Sequence packing — grouping documents into fixed-token-budget batches
for training (the T5/GPT "packing" preprocessing step, public knowledge:
concatenating short documents up to a context-length budget instead of
padding each to full length).

Exact greedy packing is inherently sequential (whether a document opens
a new batch depends on everything packed before it), so this is the
engine's one legitimate ``applyInPandas`` operator: the corpus is
hash-split into ``streams`` independent substreams (a deterministic row
property, same contract as engine/sampling.py), each substream is packed
by a tiny sequential loop inside one Arrow batch group, and streams run
in parallel. Packing quality is unaffected by the split — greedy
next-fit waste is bounded per batch, not per corpus — and determinism
is total: stream assignment and within-stream order are both hash-of-key
decisions, so any partitioning, resume, or cluster size yields
bit-identical batch ids.

Scale: the shuffle is one hash exchange on (stream); each task holds one
substream's (key, length) pairs — thin rows, not document text; with
``streams`` sized to the cluster (e.g. 10x tasks per executor) a 100 TB
corpus packs in one pass. Join the output back to the text by key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.dedup import _h64

PACKED_SCHEMA = (
    "stream int, batch_id long, key string, length long, "
    "pos int, batch_tokens long, oversize boolean"
)


def pack_sequences(
    df: DataFrame,
    budget: int,
    length_col: str,
    key_cols: list[str],
    streams: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign every row to a packed batch: (stream, batch_id, key, length,
    pos, batch_tokens, oversize).

    Greedy next-fit within each hash stream: rows are taken in hash order
    (a uniform shuffle of the substream) and appended to the current
    batch until the budget would overflow, which closes it. Rows longer
    than ``budget`` get a singleton batch with ``oversize=true`` — kept,
    flagged, never silently dropped (the caller decides truncate vs
    drop). ``batch_id`` is globally unique (stream * 2^40 + index);
    ``pos`` is the row's position within its batch; ``batch_tokens`` the
    batch's total, <= budget unless oversize.

    ``key_cols`` are cast to one \\x1f-joined string key — unique keys
    are the caller's contract (duplicate keys pack fine but can't be
    joined back unambiguously)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if streams < 1:
        raise ValueError(f"streams must be >= 1, got {streams}")

    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols]
    ).alias("key")
    h = _h64(
        F.concat_ws("\x1f", F.lit(salt), key), None, False
    )
    thin = df.select(
        key,
        F.col(length_col).cast("long").alias("length"),
        F.pmod(h, F.lit(streams)).cast("int").alias("stream"),
        h.alias("__order"),
    )

    def pack(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            pdf = pdf.sort_values(["__order", "key"], kind="mergesort")
            stream = int(pdf["stream"].iloc[0]) if len(pdf) else 0
            base = stream << 40
            out = {
                "stream": [], "batch_id": [], "key": [], "length": [],
                "pos": [], "batch_tokens": [], "oversize": [],
            }
            batch_rows: list[tuple[str, int]] = []
            batch_total = 0
            next_id = base

            def flush():
                nonlocal batch_rows, batch_total, next_id
                for pos, (k, ln) in enumerate(batch_rows):
                    out["stream"].append(stream)
                    out["batch_id"].append(next_id)
                    out["key"].append(k)
                    out["length"].append(ln)
                    out["pos"].append(pos)
                    out["batch_tokens"].append(batch_total)
                    out["oversize"].append(batch_total > budget)
                if batch_rows:
                    next_id += 1
                batch_rows, batch_total = [], 0

            for k, ln in zip(pdf["key"], pdf["length"]):
                ln = int(ln)
                if ln > budget:
                    flush()
                    batch_rows, batch_total = [(k, ln)], ln
                    flush()
                    continue
                if batch_total + ln > budget:
                    flush()
                batch_rows.append((k, ln))
                batch_total += ln
            flush()
            yield pd.DataFrame(out)

    return thin.groupBy("stream").applyInPandas(pack, schema=PACKED_SCHEMA)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row utilization summary: batches, rows, oversize rows, mean
    fill fraction of non-oversize batches."""
    per_batch = packed.groupBy("batch_id").agg(
        F.first("batch_tokens").alias("tokens"),
        F.max(F.col("oversize").cast("int")).alias("over"),
    )
    return per_batch.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("over").alias("n_oversize"),
        F.avg(
            F.when(F.col("over") == 0, F.col("tokens") / F.lit(budget))
        ).alias("mean_fill"),
    )
