"""ngram_vocab (engine/text.py): token n-gram vocabulary induction vs an
exact pure-python oracle, plus the pruning/top-k contracts."""

import re

import pytest
from pyspark.sql import functions as F

from engine import text as T

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "The cat ran"),
    (3, "a   cat\tsat"),          # messy whitespace collapses
    (4, ""),                       # empty doc drops out
    (5, "single"),                 # shorter than any bigram
]


def oracle(docs, n, lowercase=True):
    counts: dict[str, int] = {}
    dfreq: dict[str, set] = {}
    for doc_id, text in docs:
        if not text:
            continue
        t = text.lower() if lowercase else text
        toks = re.split(r"\s+", t.strip())
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            counts[g] = counts.get(g, 0) + 1
            dfreq.setdefault(g, set()).add(doc_id)
    return {g: (c, len(dfreq[g])) for g, c in counts.items()}


@pytest.fixture(scope="module")
def docs_df(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").cache()
    df.count()
    return df


@pytest.mark.parametrize("n", [1, 2, 3])
def test_vocab_matches_oracle(spark, docs_df, n):
    got = {
        r.gram: (r["count"], r.doc_freq)
        for r in T.ngram_vocab(docs_df, n=n).collect()
    }
    assert got == oracle(DOCS, n)


def test_min_count_prunes(spark, docs_df):
    got = {r.gram for r in T.ngram_vocab(docs_df, n=1, min_count=2).collect()}
    want = {g for g, (c, _) in oracle(DOCS, 1).items() if c >= 2}
    assert got == want
    assert "ran" not in got and "cat" in got


def test_top_k_deterministic(spark, docs_df):
    rows = T.ngram_vocab(docs_df, n=1, top_k=3).collect()
    ref = sorted(
        oracle(DOCS, 1).items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:3]
    assert [(r.gram, r["count"]) for r in rows] == [
        (g, c) for g, (c, _) in ref
    ]


def test_case_preserving_mode(spark, docs_df):
    got = {r.gram: r["count"] for r in T.ngram_vocab(docs_df, n=1, lowercase=False).collect()}
    assert got.get("The") == 1 and got.get("the") == 2


def test_invalid_n(spark, docs_df):
    with pytest.raises(ValueError):
        T.ngram_vocab(docs_df, n=0)
