"""normalize_text / clean_lines vs exact python oracles.

The oracle applies the SAME pattern strings with python `re` in the SAME
documented order, and the same C4 line rules in plain python — any
Spark/Java-regex divergence from the contract is an exact-string diff."""

from __future__ import annotations

import re
import unicodedata

import pytest

from engine import text as T


def _py_normalize(t, form="NFC", strip_control=True, collapse=True):
    t = re.sub(r"\r\n?", "\n", t)
    if strip_control:
        t = re.sub(T.CONTROL_CHARS_RE, "", t)
    if collapse:
        t = re.sub(r"[ \t]+", " ", t)
        t = re.sub(r" ?\n ?", "\n", t)
        t = re.sub(r"^[ \t\n]+|[ \t\n]+$", "", t)
    if form is not None:
        t = unicodedata.normalize(form, t)
    return t


DIRTY = [
    "hello\x00 world\x07!",  # C0 controls
    "a\r\nb\rc\nd",  # CRLF / CR / LF mix
    "tabs\t\tand   runs​ of﻿ space",  # zero-width + runs
    "  edge \n  trimmed  \n",  # per-line edges
    "café vs café",  # NFD e+combining vs NFC é
    "ℕ𝐨ⅈ𝕤𝕖 ¼ ﬁ",  # compatibility chars (NFKC-sensitive, NFC-stable)
    "",  # empty stays empty (no filter here)
]


@pytest.mark.parametrize("form", ["NFC", "NFKC", None])
def test_normalize_matches_python_oracle(spark, form):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DIRTY)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text
        for r in T.normalize_text(docs, unicode_form=form).collect()
    }
    for i, t in enumerate(DIRTY):
        assert got[i] == _py_normalize(t, form=form), f"doc {i} ({form})"


def test_normalize_nfc_equates_composed_forms(spark):
    docs = spark.createDataFrame(
        [(0, "café"), (1, "café")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in T.normalize_text(docs).collect()}
    assert out[0] == out[1] == "café"


def test_normalize_flags_and_contract(spark):
    docs = spark.createDataFrame(
        [(0, "a\x00  b")], "doc_id long, text string"
    )
    raw = T.normalize_text(
        docs, unicode_form=None, strip_control=False, collapse_spaces=False
    ).collect()[0].text
    assert raw == "a\x00  b"
    with pytest.raises(ValueError, match="unicode form"):
        T.normalize_text(docs, unicode_form="NFX")


def _py_clean_lines(t, min_words=3, require_terminal=True,
                    drop_markers=("javascript", "cookie", "{"), min_lines=1):
    kept = []
    for line in t.split("\n"):
        s = line.strip()
        words = [w for w in re.split(r"\s+", s) if w]
        if len(words) < min_words or not s:
            continue
        if require_terminal and not s.endswith(T.TERMINAL_PUNCT):
            continue
        if any(m in line.lower() for m in drop_markers):
            continue
        kept.append(line)
    return "\n".join(kept) if len(kept) >= min_lines else None


PAGES = [
    "This is a proper sentence.\nshort\nAnother good line here!\n"
    "Enable JavaScript to continue.\nWe use cookie banners everywhere.\n"
    "if (x) { return; }\nNo terminal punctuation here\n"
    'He said "stop".',
    "one two\nthree four",  # everything dropped -> doc dropped
    "Exactly three words.",  # survives alone
    "   \n\n  ",  # blank lines only -> dropped
]


def test_clean_lines_matches_python_oracle(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PAGES)], "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in T.clean_lines(docs).collect()}
    for i, t in enumerate(PAGES):
        want = _py_clean_lines(t)
        if want is None:
            assert i not in got, f"doc {i} should be dropped"
        else:
            assert got.get(i) == want, f"doc {i}"
    # non-text columns pass through
    extra = spark.createDataFrame(
        [(0, "Good line with words.", "meta")],
        "doc_id long, text string, tag string",
    )
    row = T.clean_lines(extra).collect()[0]
    assert row.tag == "meta"


def test_clean_lines_knobs(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta\ngamma delta epsilon")], "doc_id long, text string"
    )
    # relax terminal-punct + min_words=2: both lines survive
    out = T.clean_lines(docs, min_words=2, require_terminal=False).collect()
    assert out[0].text == "alpha beta\ngamma delta epsilon"
    # min_lines=3 drops the doc
    assert (
        T.clean_lines(
            docs, min_words=2, require_terminal=False, min_lines=3
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="min_words"):
        T.clean_lines(docs, min_words=0)


def test_normalize_then_clean_pipeline(spark):
    """The composed cleanup a real pipeline runs: normalize first so the
    line rules see canonical newlines/spaces."""
    raw = "Good first sentence.\r\njunk​\r\nSecond good line here."
    docs = spark.createDataFrame([(0, raw)], "doc_id long, text string")
    out = T.clean_lines(T.normalize_text(docs)).collect()[0].text
    assert out == "Good first sentence.\nSecond good line here."
