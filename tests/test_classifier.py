"""Quality classifier (engine/classifier.py): separable-corpus training
reaches high AUC on a held-out split and classifies the holdout
correctly; the weak-label teacher thresholds exactly; the feature-column
contract fails loudly."""

from __future__ import annotations

import pytest

from engine.classifier import (
    doc_features,
    evaluate_auc,
    score_docs,
    train_doc_classifier,
    weak_labels_by_quantile,
    weak_labels_from_score,
)
from engine.text import quality_score


def _corpus(spark, n=120, seed_split=3):
    """Deterministic separable corpus: even ids are clean prose, odd ids
    are digit/punct-heavy junk of erratic length. Returns (docs, labels,
    train_ids, test_ids) with a hash-free fixed split."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            body = ("the quick brown fox jumps over the lazy dog and keeps "
                    "running through the quiet field ") * (3 + i % 5)
            rows.append((i, body.strip()))
        else:
            body = ("12345 67%% 890)(*& 13/07 0x1f " * (1 + i % 7)) + "!!!"
            rows.append((i, body.strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(n)],
        "doc_id long, label double",
    )
    train_ids = [i for i in range(n) if i % seed_split != 0]
    test_ids = [i for i in range(n) if i % seed_split == 0]
    return docs, labels, train_ids, test_ids


def test_train_score_holdout(spark):
    docs, labels, train_ids, test_ids = _corpus(spark)
    feats = doc_features(docs).localCheckpoint(eager=True)
    tr = labels.filter(labels.doc_id.isin(train_ids))
    te = labels.filter(labels.doc_id.isin(test_ids))
    clf = train_doc_classifier(feats, tr)
    assert evaluate_auc(clf, feats, te) > 0.95
    scored = score_docs(clf, feats).filter(
        (score_docs(clf, feats).doc_id).isin(test_ids)
    )
    rows = {r.doc_id: r for r in scored.collect()}
    assert set(rows) == set(test_ids)
    wrong = [i for i in test_ids if rows[i].pred != (1 if i % 2 == 0 else 0)]
    assert len(wrong) <= len(test_ids) // 10, wrong  # >=90% holdout accuracy
    assert all(0.0 <= r.prob_keep <= 1.0 for r in rows.values())


def test_weak_labels_threshold_exact(spark):
    docs, _, _, _ = _corpus(spark, n=40)
    qs = quality_score(docs)
    lab = weak_labels_from_score(qs, hi=0.7, lo=0.4)
    got = {r.doc_id: r.label for r in lab.collect()}
    want = {}
    for r in qs.collect():
        if r.quality >= 0.7:
            want[r.doc_id] = 1.0
        elif r.quality <= 0.4:
            want[r.doc_id] = 0.0
    assert got == want
    with pytest.raises(ValueError, match="lo < hi"):
        weak_labels_from_score(qs, hi=0.4, lo=0.7)


def test_quantile_teacher_on_concentrated_scores(spark):
    # scores packed into [0.60, 0.70] — the fixed 0.7/0.4 band labels
    # nothing, the quantile teacher still carves top/bottom fractions
    qs = spark.createDataFrame(
        [(i, 0.60 + 0.001 * i) for i in range(101)],
        "doc_id long, quality double",
    )
    assert weak_labels_from_score(qs, hi=0.75, lo=0.4).count() == 0
    lab = {r.doc_id: r.label for r in
           weak_labels_by_quantile(qs, top=0.2, bottom=0.2).collect()}
    assert lab, "quantile teacher produced no labels"
    assert all(v == 1.0 for k, v in lab.items() if k >= 81)
    assert all(v == 0.0 for k, v in lab.items() if k <= 19)
    assert not any(35 <= k <= 65 for k in lab)  # middle band dropped
    # degenerate distribution -> loud
    flat = spark.createDataFrame(
        [(i, 0.5) for i in range(50)], "doc_id long, quality double"
    )
    with pytest.raises(ValueError, match="degenerate"):
        weak_labels_by_quantile(flat)


def test_one_class_training_fails_loudly(spark):
    docs, labels, _, _ = _corpus(spark, n=20)
    feats = doc_features(docs)
    only_pos = labels.filter(labels.label == 1.0)
    with pytest.raises(ValueError, match="one-class"):
        train_doc_classifier(feats, only_pos)


def test_feature_contract_fails_loudly(spark):
    docs, labels, _, _ = _corpus(spark, n=20)
    feats = doc_features(docs).drop("bpe_chunks")
    with pytest.raises(ValueError, match="bpe_chunks"):
        train_doc_classifier(feats, labels)


def test_repetition_features_compose(spark):
    docs, labels, _, _ = _corpus(spark, n=30)
    feats = doc_features(docs, include_repetition=True)
    rep_cols = [c for c in feats.columns if "dup" in c or "gram" in c]
    assert rep_cols, feats.columns
    clf = train_doc_classifier(
        feats, labels,
        feature_cols=("alpha_ratio", "digit_ratio", *rep_cols),
    )
    assert evaluate_auc(clf, feats, labels) > 0.9
