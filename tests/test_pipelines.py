"""curate_corpus end-to-end: each gate removes exactly the planted
offender, the funnel is honest, near-dups collapse to the min doc_id,
chunk mode emits windows, stats-off returns the same rows lazily."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.pipelines import curate_corpus

GOOD_EN = (
    "The quick brown fox jumps over the lazy dog near the river bank. "
    "It was a bright morning and the air was full of the smell of rain. "
    "Everyone in the village agreed that the harvest would be good this year."
)
NEAR_DUP = (
    "The quick brown fox jumps over the lazy dog near the river bank. "
    "It was a bright morning and the air was full of the smell of rain. "
    "Everyone in the town agreed that the harvest would be good this year."
)
GOOD_EN_2 = (
    "A completely different document about the history of distributed systems. "
    "These machines exchanged messages over unreliable networks for decades. "
    "The literature on consensus is rich with the lessons of those failures."
)
SPANISH = (
    "El rapido zorro marron salta sobre el perro perezoso cerca del rio. "
    "Era una manana luminosa y el aire estaba lleno del olor de la lluvia. "
    "Toda la gente del pueblo estaba de acuerdo en que la cosecha seria buena."
)
DIGITS = "1029 3847 5665 the 9182 7364 0192 " * 30 + "the end."
JUNKLINES = "click to accept cookie policy\n{ var x = 1 }\nok"


def _docs(spark):
    rows = [
        (0, GOOD_EN),
        (1, GOOD_EN),             # exact dup of 0 (after normalize)
        (2, GOOD_EN.replace(" ", "  ")),  # whitespace variant -> exact dup
        (3, NEAR_DUP),            # near-dup of 0
        (4, GOOD_EN_2),
        (5, SPANISH),             # language gate
        (6, DIGITS),              # quality gate
        (7, JUNKLINES),           # C4 line gate (no surviving lines)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_every_gate_removes_its_offender(spark):
    cur, funnel = curate_corpus(spark, _docs(spark), unicode_form=None)
    kept = sorted(r.doc_id for r in cur.collect())
    # 0 survives (min id of the exact+near cluster), 4 survives
    assert kept == [0, 4]
    assert funnel["input"] == 8
    assert funnel["normalized"] == 8          # normalization never drops
    assert funnel["c4_lines"] == 7            # doc 7 out
    assert funnel["lang"] == 6                # doc 5 out
    assert funnel["quality"] == 5             # doc 6 out
    assert funnel["exact_dedup"] == 3         # docs 1, 2 out (2 via normalize)
    assert funnel["near_dedup"] == 2          # doc 3 out
    # text of the survivor is the normalized form (single spaces)
    text0 = {r.doc_id: r.text for r in cur.collect()}[0]
    assert "  " not in text0


def test_stats_off_same_rows_and_chunk_mode(spark):
    cur_on, funnel = curate_corpus(spark, _docs(spark), unicode_form=None)
    cur_off, empty = curate_corpus(
        spark, _docs(spark), unicode_form=None, collect_stats=False
    )
    assert empty == {}
    assert sorted(r.doc_id for r in cur_off.collect()) == sorted(
        r.doc_id for r in cur_on.collect()
    )
    chunks, f2 = curate_corpus(
        spark, _docs(spark), unicode_form=None, chunk_size=10, chunk_stride=10
    )
    rows = chunks.collect()
    assert f2["chunks"] == len(rows) > f2["near_dedup"]  # docs split up
    assert all(r.chunk_tokens <= 10 for r in rows)
    # disjoint chunks reconstruct each surviving doc
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_start)):
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    full = {r.doc_id: r.text for r in cur_on.collect()}
    for d, parts in by_doc.items():
        assert " ".join(parts) == full[d]


def test_gates_can_be_disabled(spark):
    cur, funnel = curate_corpus(
        spark,
        _docs(spark),
        keep_langs=(),
        min_quality=0,
        unicode_form=None,
    )
    kept = sorted(r.doc_id for r in cur.collect())
    assert 5 in kept and 6 in kept  # language + quality gates off
    assert "lang" not in funnel and "quality" not in funnel
