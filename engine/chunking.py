"""Document chunking — overlapping token windows for embedding pipelines.

The preprocessing step between raw documents and an embedding model with
a fixed context: split each document into windows of ``size`` tokens
advancing by ``stride`` (overlap = size - stride keeps boundary context;
RAG/retrieval practice, public knowledge). The dual of
engine/packing.py's ``pack_sequences`` (chunking splits long docs down
to a budget; packing bins short ones up to it).

Window placement: starts at 0, stride, 2*stride, ...; the LAST start is
pulled forward to the smallest stride multiple covering the tail, so
every token is in >=1 chunk and no chunk hangs past the end by more than
the final overlap. A document shorter than ``size`` yields exactly one
chunk of its full length; an empty/whitespace document yields zero
chunks (there is nothing to embed — callers wanting fail-loudly can
anti-join the output against the input).

Spark shape: pure codegen — split once, ``posexplode(sequence(...))``
for the starts, ``slice`` + ``array_join`` per window. No UDF, no
shuffle at all (explode is a map-side operator); the output is
embarrassingly partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int,
    stride: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """All doc columns + (chunk_id, chunk_start, chunk_tokens,
    chunk_text): whitespace-token windows of ``size`` advancing by
    ``stride`` (default = size, i.e. disjoint). ``chunk_start`` is the
    0-based token offset; ``chunk_id`` numbers windows per document.
    """
    if size < 1:
        raise ValueError(f"chunk_documents: size must be >= 1, got {size}")
    stride = size if stride is None else stride
    if not 1 <= stride <= size:
        raise ValueError(
            f"chunk_documents: stride must be in [1, size], got {stride} "
            f"(stride > size would drop the tokens between windows)"
        )
    # strip ALL leading/trailing whitespace before splitting: Spark's
    # trim() removes only ASCII spaces, and split() keeps the resulting
    # leading/trailing empty strings — a doc ending in '\n' would grow a
    # phantom empty token and a garbage chunk (code-review r4, confirmed)
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.split(stripped, r"\s+")
    n = F.when(
        F.col(text_col).isNull() | (stripped == ""), F.lit(0)
    ).otherwise(F.size(toks))
    # last start = smallest stride multiple >= n - size (0 when n <= size)
    last = F.greatest(
        F.lit(0),
        (
            F.floor((n - F.lit(size) + F.lit(stride) - 1) / F.lit(stride))
            * F.lit(stride)
        ).cast("int"),
    )
    starts = F.when(n > 0, F.sequence(F.lit(0), last, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    out = docs.select(
        "*",
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
        toks.alias("_toks"),
        n.alias("_n"),
    )
    window = F.slice(
        F.col("_toks"),
        F.col("chunk_start") + 1,
        F.least(F.lit(size), F.col("_n") - F.col("chunk_start")),
    )
    return out.select(
        *[c for c in docs.columns],
        "chunk_id",
        "chunk_start",
        F.size(window).alias("chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
