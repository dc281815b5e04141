"""repetition_features (engine/text.py): Gopher-style repetition signals
vs an exact pure-python oracle."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from engine import text as T

DOCS = [
    (1, "unique one\nunique two\nunique three"),
    (2, "same line\nsame line\nother\nsame line"),        # dup lines
    (3, "spam spam spam spam ham"),                        # heavy 1/2-gram repeats
    (4, "a b c d e f g h"),                                # no repeats
    (5, "x"),                                              # shorter than any 2-gram
    (6, "top\n\n  \ntop\nbottom"),                         # blank lines ignored
]


def oracle(ns=(2, 3)):
    out = {}
    for doc_id, text in DOCS:
        lines = [ln for ln in text.split("\n") if ln.strip()]
        n_lines = len(lines)
        dist = set(lines)
        dup_line_frac = round((n_lines - len(dist)) / n_lines, 4) if n_lines else 0.0
        line_chars = sum(len(ln) for ln in lines)
        cnt = Counter(lines)
        uniq_chars = sum(len(ln) for ln in dist if cnt[ln] == 1)
        dup_line_char_frac = (
            round((line_chars - uniq_chars) / line_chars, 4) if line_chars else 0.0
        )
        row = [dup_line_frac, dup_line_char_frac]
        toks = re.split(r"\s+", text.lower().strip())
        for n in ns:
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            if grams:
                c = Counter(grams)
                row.append(round(max(c.values()) / len(grams), 4))
                row.append(round(1 - len(c) / len(grams), 4))
            else:
                row.extend([0.0, 0.0])
        out[doc_id] = tuple(row)
    return out


def test_repetition_features_match_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: (
            r.dup_line_frac, r.dup_line_char_frac,
            r.top2gram_frac, r.dup2gram_frac,
            r.top3gram_frac, r.dup3gram_frac,
        )
        for r in T.repetition_features(df).collect()
    }
    assert got == oracle()


def test_signal_direction(spark):
    """The boilerplate doc must score strictly above the clean doc on
    every repetition axis that applies."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {r.doc_id: r for r in T.repetition_features(df).collect()}
    assert rows[2].dup_line_frac > rows[1].dup_line_frac == 0.0
    assert rows[2].dup_line_char_frac > 0.5       # 3 of 4 lines are copies
    assert rows[3].top2gram_frac > rows[4].top2gram_frac
    assert rows[3].dup2gram_frac > 0.0 and rows[4].dup2gram_frac == 0.0
    assert rows[5].top2gram_frac == 0.0           # too short: defined as 0
