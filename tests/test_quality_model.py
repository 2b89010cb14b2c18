"""Trainable quality classifier (MLlib LR over native feature signals)."""

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.quality_model import (
    FEATURE_COLS,
    fit_quality_classifier,
    quality_features,
    score_quality,
)
from geoscan_fraud_spark.sources.io import load_fixture


def _labeled(spark, sf_dir):
    """Fixture docs labeled good; synthetic spam labeled bad."""
    good = (
        load_fixture(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("label", F.lit(1))
    )
    spam_rows = [
        (10_000 + i, ("buy now " * (5 + i % 7)).strip(), 0) for i in range(60)
    ] + [
        (10_100 + i, ("aaa bbb " + "zzz " * (30 + i)).strip(), 0)
        for i in range(60)
    ]
    spam = spark.createDataFrame(spam_rows, "doc_id long, text string, label int")
    return good.unionByName(spam)


def test_features_are_complete_and_null_free(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    feats = quality_features(docs)
    assert feats.columns == ["doc_id"] + FEATURE_COLS
    n = docs.count()
    assert feats.count() == n
    for c in FEATURE_COLS:
        assert feats.filter(F.col(c).isNull()).count() == 0


def test_classifier_separates_spam_from_fixture(spark, sf_dir):
    labeled = _labeled(spark, sf_dir)
    model = fit_quality_classifier(labeled)
    scored = score_quality(labeled, model).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    good = [r["p_good"] for r in rows if r["label"] == 1]
    bad = [r["p_good"] for r in rows if r["label"] == 0]
    # means separate decisively, and a tau=0.5 cut is mostly right
    assert sum(good) / len(good) > 0.8
    assert sum(bad) / len(bad) < 0.2
    acc = (
        sum(1 for g in good if g >= 0.5) + sum(1 for b in bad if b < 0.5)
    ) / len(rows)
    assert acc >= 0.95


def test_scoring_held_out_spam(spark, sf_dir):
    """The model generalizes to spam patterns not in training."""
    labeled = _labeled(spark, sf_dir)
    model = fit_quality_classifier(labeled)
    unseen = spark.createDataFrame(
        [(50_000 + i, ("click here " * (10 + i)).strip()) for i in range(20)],
        "doc_id long, text string",
    )
    scored = score_quality(unseen, model)
    assert scored.agg(F.avg("p_good")).first()[0] < 0.3


def test_model_save_load_roundtrip(spark, sf_dir, tmp_path):
    labeled = _labeled(spark, sf_dir)
    model = fit_quality_classifier(labeled)
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["p_good"] for r in score_quality(labeled, model).collect()}
    b = {r["doc_id"]: r["p_good"] for r in score_quality(labeled, loaded).collect()}
    assert a == b


def test_choose_tau_hits_keep_rate(spark, sf_dir):
    from geoscan_fraud_spark.operators.quality_model import choose_tau

    labeled = _labeled(spark, sf_dir)
    model = fit_quality_classifier(labeled)
    scored = score_quality(labeled, model)
    tau = choose_tau(scored, keep_rate=0.8)
    kept = scored.filter(F.col("p_good") >= tau).count() / scored.count()
    assert abs(kept - 0.8) < 0.05
    with pytest.raises(ValueError):
        choose_tau(scored, keep_rate=0.0)


def test_pipeline_quality_model_gate(spark, sf_dir):
    """The learned gate composes into prepare_training_corpus: spam is
    rejected with reason 'quality_model' and p_good joins the audit."""
    from geoscan_fraud_spark.operators.pipelines import prepare_training_corpus

    labeled = _labeled(spark, sf_dir)
    model = fit_quality_classifier(labeled)

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    # spam long enough to slip past the default length rule, caught only
    # by the classifier
    spam = spark.createDataFrame(
        [(800_001, ("win money fast " * 20).strip())],
        "doc_id long, text string",
    )
    corpus_in = docs.unionByName(spam)
    out = prepare_training_corpus(
        corpus_in,
        dedup_threshold=0.5,
        quality_model=model,
        min_p_good=0.5,
        # loosen the repetition rules so the classifier is the deciding gate
        quality_rules={"too_short": F.col("n_tokens") >= 3},
    )
    ann = out["annotated"]
    assert "p_good" in ann.columns
    row = ann.filter(F.col("doc_id") == 800_001).first()
    assert row["reject_reason"] == "quality_model"
    kept = {r.doc_id for r in out["corpus"].select("doc_id").collect()}
    assert 800_001 not in kept and len(kept) > 0
