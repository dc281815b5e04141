"""Byte-pair-encoding vocabulary learning over the corpus — the tokenizer-
training stage of an LLM data pipeline (Sennrich, Haddow, Birch 2016,
"Neural machine translation of rare words with subword units" — public
knowledge; the GPT-2/RoBERTa tokenizers are the same construction over
bytes).

The 100-TB architecture is the published one, split honestly:

- **Word counting is distributed** — one codegen'd split + explode +
  partial-agg groupBy over the corpus. This is the only pass that sees
  all the data.
- **Merge learning is driver-side on the word-frequency dict.** BPE
  training state is O(distinct words), not O(corpus): every merge
  decision needs only the aggregated (word, count) table (Sennrich's own
  implementation trains on a dict). The collect is capped and FAILS
  LOUDLY above ``max_words`` — at web scale you bound the dict first
  (min_freq pruning / top-N truncation, both standard and exposed here),
  you don't stream a billion-row dict through a driver loop.
- **Encoding is distributed again** — the learned merge list (a few
  thousand string pairs) broadcasts into an Arrow-batched pandas UDF
  that applies merges greedily in rank order with a per-batch word cache
  (corpus word frequency follows Zipf, so the cache hit rate is high).

Determinism: pair ties break lexicographically, so the merge sequence is
a pure function of the counted dict — bit-identical across runs,
partitionings and engines.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, n) over whitespace-split tokens — the one corpus-wide pass.
    Partial-aggregable groupBy; the result is the Zipf-compressed dict
    every later stage works from."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(F.explode(F.split(F.trim(t), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@dataclass(frozen=True)
class BPEModel:
    """merges: ordered (left, right) pairs; rank = list position.
    n_requested vs len(merges) differ when the dict ran dry (no pair
    reached min_freq) — reported, not silent."""

    merges: tuple[tuple[str, str], ...]
    n_requested: int
    min_freq: int


def learn_bpe(
    counts: DataFrame,
    n_merges: int = 1000,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> BPEModel:
    """Sennrich BPE on the aggregated (word, n) dict.

    The dict is collected to the driver — bounded: raises above
    ``max_words`` distinct words (prune with min_freq or top-N BEFORE
    calling; the loud failure is the architecture statement, see module
    docstring). Merging then never touches the cluster."""
    n_words = counts.count()
    if n_words > max_words:
        raise ValueError(
            f"learn_bpe: {n_words} distinct words exceeds max_words="
            f"{max_words}; prune the dict first (filter n >= k, or top-N "
            f"by count) — BPE training state must stay driver-sized"
        )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.word) + (END,): r.n for r in counts.collect()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair (determinism)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return BPEModel(merges=tuple(merges), n_requested=n_merges, min_freq=min_freq)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        cands = [
            (ranks[(sym[i], sym[i + 1])], i)
            for i in range(len(sym) - 1)
            if (sym[i], sym[i + 1]) in ranks
        ]
        if not cands:
            break
        # lowest-rank merge first; leftmost occurrence of it
        rank = min(r for r, _ in cands)
        i = min(i for r, i in cands if r == rank)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def encode_bpe(
    docs: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(doc_id, bpe_tokens array<string>, n_bpe_tokens) — distributed
    greedy encode. The merge-rank table rides the closure (broadcast,
    a few thousand pairs); a per-batch word cache exploits Zipf."""
    ranks = {p: i for i, p in enumerate(model.merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(text):
            out: list[str] = []
            if text is None:
                return out
            for w in (text.lower() if lowercase else text).split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(one)

    return docs.select(
        "doc_id",
        enc(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
