"""DSIR importance resampling (operators/dsir.py): python value oracle
for the weights, target-affinity bias of the draw, log-space sampler
parity, determinism, and plan shape."""
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.dsir import dsir_sample, importance_weights
from geoscan_fraud_spark.operators.sampling import (
    weighted_sample,
    weighted_sample_log,
)
from geoscan_fraud_spark.operators.text import fit_unigram_lm


def _py_unigram(texts, alpha=0.5):
    c = Counter(t for x in texts for t in x.split() if t)
    n, v = sum(c.values()), len(c)
    denom = n + alpha * (v + 1)
    return (
        {t: math.log((k + alpha) / denom) for t, k in c.items()},
        math.log(alpha / denom),
    )


def test_importance_weights_match_python_reference(spark):
    target_txt = ["the cat sat", "the cat ran", "a cat sat"]
    raw_txt = ["the dog ran far", "a dog barked", "the cat sat", "x y z"]
    t_py, t_oov_py = _py_unigram(target_txt)
    r_py, r_oov_py = _py_unigram(raw_txt)

    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target_txt)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw_txt)], "doc_id long, text string"
    )
    t_lm, t_oov = fit_unigram_lm(target)
    r_lm, r_oov = fit_unigram_lm(raw)
    assert t_oov == pytest.approx(t_oov_py)
    assert r_oov == pytest.approx(r_oov_py)

    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(raw, t_lm, t_oov, r_lm, r_oov).collect()
    }
    for i, txt in enumerate(raw_txt):
        expected = sum(
            t_py.get(t, t_oov_py) - r_py.get(t, r_oov_py) for t in txt.split()
        )
        assert got[i] == pytest.approx(expected, abs=1e-6), txt
    # the target-like doc carries the largest ratio
    assert max(got, key=got.get) == 2


def test_dsir_sample_biases_toward_target_style(spark):
    """Raw corpus = two disjoint styles; target = style A only. The draw
    must overwhelmingly pick style-A docs."""
    a_words = [f"alpha{i}" for i in range(30)]
    b_words = [f"beta{i}" for i in range(30)]
    import random

    rng = random.Random(3)
    mk = lambda ws: " ".join(rng.choice(ws) for _ in range(25))
    raw_rows = [(i, mk(a_words)) for i in range(100)] + [
        (i + 100, mk(b_words)) for i in range(100)
    ]
    target_rows = [(i, mk(a_words)) for i in range(20)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")

    picked = dsir_sample(raw, target, k=40)
    rows = picked.collect()
    assert len(rows) == 40
    assert "log_weight" in picked.columns
    n_a = sum(1 for r in rows if r["doc_id"] < 100)
    assert n_a >= 38  # style B importance ratio is astronomically small


def test_weighted_sample_log_matches_linear_on_small_range(spark):
    """With weights in a safe range, log-space A-ES must select the same
    rows as the linear-weight sampler (identical keys up to monotone
    transform + identical tiebreak)."""
    rows = [(i, 0.5 + (i * 37 % 97) / 10.0) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double").withColumn(
        "lw", F.log("w")
    )
    lin = sorted(r["doc_id"] for r in weighted_sample(df, "w", 25).collect())
    log = sorted(
        r["doc_id"] for r in weighted_sample_log(df, "lw", 25).collect()
    )
    assert lin == log


def test_weighted_sample_log_determinism_and_extreme_range(spark):
    """Stable across partitionings, and a row whose weight is hundreds of
    orders of magnitude larger is always selected while the linear
    sampler's double weights would overflow."""
    rows = [(i, float(-(i % 50))) for i in range(1, 400)] + [(1000, 900.0)]
    df = spark.createDataFrame(rows, "doc_id long, lw double")
    a = sorted(r["doc_id"] for r in weighted_sample_log(df, "lw", 10).collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_log(df.repartition(13), "lw", 10).collect()
    )
    assert a == b
    assert 1000 in a


def test_importance_weights_plan_is_broadcast(spark, sf_dir):
    from geoscan_fraud_spark.sources.io import load_fixture

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    t_lm, t_oov = fit_unigram_lm(docs.limit(40))
    r_lm, r_oov = fit_unigram_lm(docs.limit(80))
    plan = (
        importance_weights(docs, t_lm, t_oov, r_lm, r_oov)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-side scoring join must broadcast the merged vocabulary;
    # the one permitted SortMergeJoin is the vocabulary-sized full-outer
    # LM merge (full outer cannot broadcast), which never sees the corpus
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1


def test_dsir_empty_doc_neutral_weight(spark):
    raw = spark.createDataFrame(
        [(0, "a b c"), (1, "")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    t_lm, t_oov = fit_unigram_lm(target)
    r_lm, r_oov = fit_unigram_lm(raw)
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in importance_weights(raw, t_lm, t_oov, r_lm, r_oov).collect()
    }
    assert got[1] == (0, 0.0)
