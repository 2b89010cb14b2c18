"""Interpolated bigram LM (operators/text.py::fit_bigram_lm /
bigram_perplexity_score): python value oracle, word-order sensitivity
(the signal unigram perplexity cannot see), and plan shape."""
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.text import (
    bigram_perplexity_score,
    fit_bigram_lm,
    fit_unigram_lm,
    perplexity_score,
)


def _py_bigram_nll(train_texts, text, alpha=0.5, lam=0.7):
    uni = Counter(t for x in train_texts for t in x.split() if t)
    big = Counter()
    for x in train_texts:
        ws = [t for t in x.split() if t]
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    n, v = sum(uni.values()), len(uni)
    uni_denom = n + alpha * (v + 1)

    def p_uni(w):
        return (uni.get(w, 0) + alpha) / uni_denom if w in uni else alpha / uni_denom

    def ctx_denom(w):
        return uni.get(w, 0) + alpha * (v + 1)

    ws = [t for t in text.split() if t]
    if not ws:
        return None, 0
    lps = [math.log(p_uni(ws[0]))]
    for a, b in zip(ws, ws[1:]):
        pb = (big.get((a, b), 0) + alpha) / ctx_denom(a)
        lps.append(math.log(lam * pb + (1 - lam) * p_uni(b)))
    return -sum(lps) / len(lps), len(ws)


def test_bigram_matches_python_reference(spark):
    train_texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat ran to the mat",
    ]
    score_texts = [
        (0, "the cat sat on the mat"),
        (1, "mat the on sat cat the"),   # same unigrams, shuffled order
        (2, "zz qq ww"),                 # all OOV
        (3, ""),
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    score = spark.createDataFrame(score_texts, "doc_id long, text string")
    bg, ug, oov = fit_bigram_lm(train)
    out = {
        r["doc_id"]: r.asDict()
        for r in bigram_perplexity_score(score, bg, ug, oov).collect()
    }
    for i, txt in score_texts:
        nll, ntok = _py_bigram_nll(train_texts, txt)
        assert out[i]["n_tokens"] == ntok, txt
        if nll is None:
            assert out[i]["nll"] is None
        else:
            assert out[i]["nll"] == pytest.approx(nll, abs=1e-6), txt


def test_bigram_sees_word_order_where_unigram_cannot(spark):
    train_texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "the bird sat on the branch",
        "a cat sat on a mat",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    # unigram: identical scores for the shuffled doc
    lm, oov = fit_unigram_lm(train)
    u = {r["doc_id"]: r["nll"] for r in perplexity_score(score, lm, oov).collect()}
    assert u[0] == pytest.approx(u[1], abs=1e-9)
    # bigram: the shuffled doc must score strictly worse
    bg, ug, boov = fit_bigram_lm(train)
    b = {
        r["doc_id"]: r["nll"]
        for r in bigram_perplexity_score(score, bg, ug, boov).collect()
    }
    assert b[1] > b[0] + 0.3


def test_bigram_score_plan_is_broadcast(spark, sf_dir):
    from geoscan_fraud_spark.sources.io import load_fixture

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    bg, ug, oov = fit_bigram_lm(docs.limit(60))
    plan = (
        bigram_perplexity_score(docs, bg, ug, oov)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every corpus-side join broadcasts a model-sized relation
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_unbroadcast_model_matches(spark):
    """broadcast_model=False (the web-scale-model escape) must produce
    identical values through the shuffle-join plan."""
    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a cat ran")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(0, "the cat sat"), (1, "zz qq")], "doc_id long, text string"
    )
    bg, ug, oov = fit_bigram_lm(train)
    a = {
        r["doc_id"]: r["nll"]
        for r in bigram_perplexity_score(score, bg, ug, oov).collect()
    }
    b = {
        r["doc_id"]: r["nll"]
        for r in bigram_perplexity_score(
            score, bg, ug, oov, broadcast_model=False
        ).collect()
    }
    assert a == b
