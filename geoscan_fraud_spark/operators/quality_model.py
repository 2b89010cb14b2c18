"""Trainable document-quality classifier — the ML sibling of the
rule-based Gopher gate (`operators/text.py::annotate_filter_reasons`).

Production LLM pipelines grade corpora with a learned classifier (a
fastText / linear model over cheap features, trained on a small labeled
set of good vs bad documents — the FineWeb-style recipe); the rules
catch gross spam, the classifier ranks everything else. This module
builds exactly that shape on MLlib:

* features are the engine's existing NATIVE signals — token stats,
  repetition fractions, entropy, stopword/punctuation ratios — computed
  as whole-stage-codegen'd column expressions (no Python, no tokenizer
  dependency), assembled into an MLlib vector;
* `fit_quality_classifier` trains a distributed logistic regression on
  a labeled sample (labels are cheap: a few thousand docs);
* `score_quality` is map-only at inference: the model's coefficients
  fold into the plan, the corpus never shuffles.

Reference lineage: the reference packages per-user models behind a
pyfunc scorer (`02_geofraud_fraud.py:220-238`); this is the same
train-once / score-distributed shape for corpus quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.text import (
    quality_score,
    repetition_stats,
    token_entropy,
    token_stats,
)

#: feature column order — FIXED: persisted models depend on it
FEATURE_COLS = [
    "n_tokens_log",
    "avg_token_len",
    "stopword_ratio",
    "distinct_ratio",
    "dup_frac_2",
    "dup_frac_3",
    "top_frac_2",
    "entropy",
]


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, <FEATURE_COLS...>): the classifier's input signals, all
    native expressions joined on id (three map-only operators + one
    shared-partitioning join set; NULL-free — missing signals coalesce
    to 0 so MLlib's assembler never drops rows)."""
    ts = token_stats(df, text_col, id_col).select(
        id_col,
        F.log(F.col("n_tokens") + 1).alias("n_tokens_log"),
        F.col("avg_token_len"),
    )
    qs = quality_score(df, text_col, id_col).select(
        id_col, "stopword_ratio", "distinct_ratio"
    )
    reps = repetition_stats(df, text_col, id_col, ns=(2, 3)).select(
        id_col, "dup_frac_2", "dup_frac_3", "top_frac_2"
    )
    ent = token_entropy(df, text_col, id_col).select(id_col, "entropy")
    out = ts.join(qs, id_col).join(reps, id_col).join(ent, id_col)
    return out.select(
        id_col,
        *[
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
            for c in FEATURE_COLS
        ],
    )


def fit_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Train a logistic-regression quality model from (text, label∈{0,1})
    rows (1 = keep). Returns the fitted MLlib PipelineModel
    (scaler + LR — features span orders of magnitude, so they are
    standardized before the linear model). Distributed fit; the labeled
    set is typically small but nothing here requires it to be."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled, text_col, id_col).join(
        labeled.select(id_col, F.col(label_col).cast("double").alias("label")),
        id_col,
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="__raw"),
            StandardScaler(
                inputCol="__raw", outputCol="features", withMean=True, withStd=True
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, p_good): keep-probability for every document under a fitted
    model. Map-only after the feature join set — the model's transform is
    per-row arithmetic; filter with ``p_good >= tau`` (pick tau on a
    validation slice)."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(df, text_col, id_col)
    scored = model.transform(feats)
    return scored.select(
        id_col,
        F.round(vector_to_array(F.col("probability"))[1], 6).alias("p_good"),
    )


def choose_tau(
    scored: DataFrame, keep_rate: float, p_col: str = "p_good"
) -> float:
    """Threshold achieving a target keep rate: the (1 - keep_rate)
    quantile of the score distribution on a validation slice — how
    production pipelines actually pick tau (a fixed 0.5 bakes in the
    classifier's calibration, which a corpus shift silently breaks).
    One small aggregate (`percentile_approx` — the scale-safe sketch)."""
    if not 0.0 < keep_rate <= 1.0:
        raise ValueError(f"keep_rate must be in (0, 1], got {keep_rate}")
    q = scored.agg(
        F.percentile_approx(F.col(p_col), 1.0 - keep_rate).alias("tau")
    ).first()["tau"]
    return float(q if q is not None else 0.0)
