"""PII detection/redaction vs python `re` running the IDENTICAL pattern
strings — exact per-document equality (the patterns deliberately avoid
every construct where Java regex and python `re` semantics diverge)."""

from __future__ import annotations

import re

from engine.text import PII_ORDER, PII_PATTERNS, pii_counts, redact_pii

DOCS = [
    (0, "contact alice.smith+spam@ex-ample.co.uk or bob@x.io today"),
    (1, "server at 10.0.0.1 and 255.255.255.255, not 999.1.1.1 or 1.2.3"),
    (2, "call (555) 123-4567 or +1 555-123-4567 or 555.123.4567"),
    (3, "ssn 123-45-6789 embedded; phone-less; ip-less"),
    (4, "mixed: a@b.cc at 192.168.1.77, dial 555 123-4567, ssn 000-00-0000"),
    (5, "nothing sensitive here, just text with numbers 123456789"),
    (6, ""),
    (7, "edge: v4-ish 256.1.1.1 (no), 0.0.0.0 (yes); mail x@y.z (no tld<2)"),
]


def _spark_docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_counts_match_python_re(spark):
    got = {
        r.doc_id: {k: r[f"n_{k}"] for k in PII_PATTERNS} | {"tot": r.n_pii}
        for r in pii_counts(_spark_docs(spark)).collect()
    }
    for doc_id, text in DOCS:
        want = {k: len(re.findall(p, text)) for k, p in PII_PATTERNS.items()}
        want["tot"] = sum(want.values())
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    # sanity: the fixture actually exercises every kind
    assert sum(v["tot"] for v in got.values()) >= 8
    for k in PII_PATTERNS:
        assert any(v[k] > 0 for v in got.values()), f"no {k} matched"


def test_redaction_matches_python_re_and_is_clean(spark):
    red = {
        r.doc_id: r.text
        for r in redact_pii(_spark_docs(spark)).collect()
    }
    for doc_id, text in DOCS:
        expect = text
        for kind in PII_ORDER:
            expect = re.sub(
                PII_PATTERNS[kind], f"[PII_{kind.upper()}]", expect
            )
        assert red[doc_id] == expect, (doc_id, red[doc_id], expect)
    # idempotence: redacting redacted text changes nothing
    again = {
        r.doc_id: r.text
        for r in redact_pii(
            redact_pii(_spark_docs(spark))
        ).collect()
    }
    assert again == red
    # and no pattern still matches post-redaction
    for text in red.values():
        for k, p in PII_PATTERNS.items():
            assert not re.search(p, text), (k, text)


def test_non_text_columns_pass_through(spark):
    base = _spark_docs(spark)
    df = base.withColumn("keep", base.doc_id * 2)
    out = redact_pii(df)
    assert set(out.columns) == {"doc_id", "text", "keep"}
    assert {r.doc_id: r.keep for r in out.collect()} == {
        d: d * 2 for d, _ in DOCS
    }
