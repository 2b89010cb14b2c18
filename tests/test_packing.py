"""Tests for the training-batch assembly operators (packing.py)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.packing import (
    pack_documents,
    pack_stats,
    stratified_sample_exact,
    token_frequencies,
)
from geoscan_fraud_spark.operators.text import token_stats
from geoscan_fraud_spark.sources.io import load_fixture

BUDGET = 256


@pytest.fixture(scope="module")
def doc_tokens(spark, sf_dir):
    d = load_fixture(spark, sf_dir, "documents")
    return (
        token_stats(d).select("doc_id", "n_tokens").persist()
    )


def test_pack_documents_invariants(spark, doc_tokens):
    packed = pack_documents(doc_tokens, BUDGET, n_shards=16).persist()
    rows = packed.collect()
    # every document assigned exactly once
    n_docs = doc_tokens.count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    # no bin over budget unless it is a singleton oversized document
    per_bin: dict[int, list[int]] = {}
    for r in rows:
        per_bin.setdefault(r["bin_id"], []).append(r["n_tokens"])
    for bin_id, toks in per_bin.items():
        if sum(toks) > BUDGET:
            assert len(toks) == 1 and toks[0] > BUDGET, bin_id
    packed.unpersist()


def test_pack_documents_deterministic_across_partitionings(spark, doc_tokens):
    a = {
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(doc_tokens, BUDGET, n_shards=16).collect()
    }
    b = {
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(
            doc_tokens.repartition(13), BUDGET, n_shards=16
        ).collect()
    }
    assert a == b


def test_pack_stats_fill_rate(spark, doc_tokens):
    packed = pack_documents(doc_tokens, BUDGET, n_shards=16)
    s = pack_stats(packed, BUDGET).first()
    assert s["n_docs"] == doc_tokens.count()
    assert s["n_bins"] >= 1
    # FFD on many small docs should fill bins well; allow slack for the
    # per-shard tail bins at tiny scale
    assert s["fill_rate"] > 0.5
    assert s["max_bin_tokens"] <= max(
        BUDGET, doc_tokens.agg(F.max("n_tokens")).first()[0]
    )


def test_pack_documents_rejects_bad_budget(spark, doc_tokens):
    with pytest.raises(ValueError):
        pack_documents(doc_tokens, 0)


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    d = load_fixture(spark, sf_dir, "documents").withColumn(
        "lang_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(5))
    )
    n = 7
    samp = stratified_sample_exact(d, ["lang_bucket"], n)
    counts = Counter(r["lang_bucket"] for r in samp.select("lang_bucket").collect())
    sizes = {
        r["lang_bucket"]: r["c"]
        for r in d.groupBy("lang_bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for bucket, size in sizes.items():
        assert counts[bucket] == min(n, size)
    # deterministic across partitionings
    ids_a = {r["doc_id"] for r in samp.select("doc_id").collect()}
    ids_b = {
        r["doc_id"]
        for r in stratified_sample_exact(d.repartition(11), ["lang_bucket"], n)
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b


def test_token_frequencies_matches_pandas(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat and dog and cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["token"]: (r["freq"], r["doc_freq"])
        for r in token_frequencies(df).collect()
    }
    freq = Counter()
    doc_freq = Counter()
    for _, text in docs:
        toks = text.split()
        freq.update(toks)
        doc_freq.update(set(toks))
    assert got == {t: (freq[t], doc_freq[t]) for t in freq}
    # top-k is deterministic: freq desc, token asc
    top = [r["token"] for r in token_frequencies(df, k=3).collect()]
    assert top == ["cat", "the", "and"]


def test_chunk_documents_matches_python_reference(spark, sf_dir):
    from geoscan_fraud_spark.operators.packing import chunk_documents

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    MAX, OV = 17, 5
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, MAX, OV).collect()
    }

    expect = {}
    for did, text in ((r["doc_id"], r["text"]) for r in docs.collect()):
        w = text.split()
        stride = MAX - OV
        n_chunks = max(1, -(-(len(w) - OV) // stride))
        for i in range(n_chunks):
            c = w[i * stride : i * stride + MAX]
            expect[(did, i)] = (" ".join(c), len(c))
    assert got == expect
    # every chunk bounded; overlap honored between consecutive chunks
    assert all(n <= MAX for _, n in got.values())


def test_chunk_documents_short_doc_single_chunk(spark):
    from geoscan_fraud_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    rows = chunk_documents(df, 128, 16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "tiny doc"
    assert rows[0]["n_tokens"] == 2


def test_chunk_documents_rejects_bad_args(spark):
    from geoscan_fraud_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 10, 10)


def test_chunk_documents_empty_doc_yields_no_chunks(spark):
    from geoscan_fraud_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real doc")], "doc_id long, text string"
    )
    rows = chunk_documents(df, 128).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["n_tokens"] == 2
