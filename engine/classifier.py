"""Trained document-quality classifier — the model-based filtering stage
of a large-scale training-data pipeline (public practice: CCNet's
wiki-vs-crawl fastText classifier, Brown et al. 2020 §A / LLaMA's
"classifier trained to recognize reference-quality pages"; the heuristic
scores in engine/text.py are the FEATURES here, not the verdict).

Spark-first shape:

- Features are the engine's existing codegen'd per-doc signals
  (quality_features + token_counts, optionally the Gopher repetition
  features) — one scan builds the design matrix, no Python in the row
  path. ``doc_features`` is the shared featurizer for training and
  scoring so the two can never skew.
- Training is MLlib ``LogisticRegression`` (JVM L-BFGS; each iteration
  is one treeAggregate pass over the feature matrix — O(iterations)
  scans, fully distributed, public Spark API). The fitted model is a
  (d+1)-float vector — broadcast-trivial at any corpus size.
- Scoring is a single whole-stage-codegen'd map pass (VectorAssembler +
  the model's dot product); at 100 TB the filter costs one read of the
  feature columns.

Labels are the caller's (weak supervision from curated seed domains,
hand labels, an upstream model — whatever the pipeline trusts);
``weak_labels_from_score`` provides the classic bootstrap teacher
(threshold the heuristic score, leave the middle band unlabeled) for
pipelines that have nothing better yet.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.text import quality_features, repetition_features, token_counts

DEFAULT_FEATURES = (
    "n_chars", "alpha_ratio", "digit_ratio", "space_ratio", "mean_tok_len",
    "n_tokens", "bpe_chunks",
)


@dataclass(frozen=True)
class DocClassifier:
    """Fitted quality model: the MLlib stage plus the exact feature-column
    contract it was trained under (scoring re-asserts it)."""

    model: object  # pyspark.ml.classification.LogisticRegressionModel
    feature_cols: tuple[str, ...]


def doc_features(docs: DataFrame, include_repetition: bool = False) -> DataFrame:
    """(doc_id, <numeric feature cols>) — one row per non-empty doc.

    quality_features ⋈ token_counts (same scan family, both codegen'd);
    ``include_repetition`` adds the Gopher dup-line/n-gram measures
    (engine/text.repetition_features — costs one explode per n)."""
    out = quality_features(docs).join(
        token_counts(docs).select("doc_id", "n_tokens", "bpe_chunks"),
        "doc_id",
    )
    if include_repetition:
        out = out.join(repetition_features(docs), "doc_id")
    return out


def weak_labels_from_score(
    scores: DataFrame, hi: float = 0.7, lo: float = 0.4
) -> DataFrame:
    """(doc_id, label) bootstrap teacher from engine/text.quality_score
    output: score >= hi -> 1.0, <= lo -> 0.0, the ambiguous middle band is
    DROPPED (unlabeled) — the standard high-precision/low-recall seeding."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got lo={lo} hi={hi}")
    return scores.select(
        "doc_id",
        F.when(F.col("quality") >= hi, F.lit(1.0))
        .when(F.col("quality") <= lo, F.lit(0.0))
        .alias("label"),
    ).filter(F.col("label").isNotNull())


def weak_labels_by_quantile(
    scores: DataFrame, top: float = 0.2, bottom: float = 0.2
) -> DataFrame:
    """Quantile-calibrated variant of ``weak_labels_from_score`` — label
    the top/bottom score fractions, drop the middle. Fixed thresholds
    assume a score distribution; real corpora concentrate (the synthetic
    documents table scores entirely within [0.61, 0.70], where the fixed
    0.7/0.4 band labels NOTHING — found by the verify drive). Two
    approxQuantile scalars to the driver; the band collapsing to a single
    value (degenerate distribution) raises instead of returning an
    all-one-class teacher."""
    if not (0 < top < 1 and 0 < bottom < 1 and top + bottom <= 1):
        raise ValueError(f"need fractions in (0,1), top+bottom <= 1; "
                         f"got top={top} bottom={bottom}")
    lo, hi = scores.approxQuantile("quality", [bottom, 1.0 - top], 0.001)
    if not lo < hi:
        raise ValueError(
            f"degenerate quality distribution: bottom-{bottom} and top-{top} "
            f"quantiles coincide at {lo} — no separable band to teach from"
        )
    return weak_labels_from_score(scores, hi=hi, lo=lo)


def _assemble(features: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    missing = [c for c in cols if c not in features.columns]
    if missing:
        raise ValueError(
            f"feature columns absent from the input: {missing} — featurize "
            f"with doc_features(...) (same contract for train and score)"
        )
    asm = VectorAssembler(
        inputCols=list(cols), outputCol="features", handleInvalid="error"
    )
    return asm.transform(
        features.select(
            "doc_id", *[F.col(c).cast("double").alias(c) for c in cols]
        )
    )


def train_doc_classifier(
    features: DataFrame,
    labels: DataFrame,
    feature_cols: tuple[str, ...] = DEFAULT_FEATURES,
    max_iter: int = 64,
    reg_param: float = 0.0,
    elastic_net: float = 0.0,
) -> DocClassifier:
    """Fit logistic regression on (features ⋈ labels).

    ``labels``: (doc_id, label in {0.0, 1.0}). Standardization is on
    (MLlib default) so the raw feature scales — n_chars in the thousands
    next to ratios in [0,1] — don't distort the L-BFGS geometry."""
    data = _assemble(features, feature_cols).join(
        labels.select("doc_id", F.col("label").cast("double").alias("label")),
        "doc_id",
    ).localCheckpoint(eager=True)  # L-BFGS scans it per iteration
    n_pos = data.filter(F.col("label") == 1.0).count()
    n_neg = data.filter(F.col("label") == 0.0).count()
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"train_doc_classifier: training set has {n_pos} positive / "
            f"{n_neg} negative rows after the feature⋈label join — a "
            f"one-class (or empty) teacher cannot fit; check the label "
            f"thresholds (weak_labels_by_quantile adapts to the corpus) "
            f"and that label doc_ids exist in the feature table"
        )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, elasticNetParam=elastic_net,
        featuresCol="features", labelCol="label",
    )
    try:
        model = lr.fit(data)
    finally:
        data.unpersist()  # L-BFGS is done with the checkpointed matrix
    # Drop the training summary: it pins the live SparkSession inside the
    # model, and scoring closures serialize the model — with the session
    # attached, task serialization fails whenever the session has ever run
    # an observed query (the lazy ObservationManager field is initialized
    # by the first Dataset.observe and is not serializable; the engine's
    # iterative loops observe their convergence scalars, so that is the
    # NORMAL session state). The summary is training-time diagnostics the
    # engine never reads; holdout metrics come from evaluate_auc.
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        jnone = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        model._java_obj.setSummary(jnone)
    except Exception:  # pragma: no cover — summary stays, scoring may
        pass           # still work when no observed query ever ran
    return DocClassifier(model=model, feature_cols=tuple(feature_cols))


def score_docs(clf: DocClassifier, features: DataFrame) -> DataFrame:
    """(doc_id, prob_keep, pred) — P(label=1) and the 0.5-threshold call.
    One map pass; the model rides the closure (d+1 floats)."""
    scored = clf.model.transform(_assemble(features, clf.feature_cols))
    return scored.select(
        "doc_id",
        vector_to_array(F.col("probability")).getItem(1).alias("prob_keep"),
        F.col("prediction").cast("int").alias("pred"),
    )


def evaluate_auc(
    clf: DocClassifier, features: DataFrame, labels: DataFrame
) -> float:
    """Area under ROC on a labeled holdout (MLlib evaluator, distributed)."""
    scored = clf.model.transform(
        _assemble(features, clf.feature_cols).join(
            labels.select(
                "doc_id", F.col("label").cast("double").alias("label")
            ),
            "doc_id",
        )
    )
    ev = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction",
        metricName="areaUnderROC",
    )
    return float(ev.evaluate(scored))
