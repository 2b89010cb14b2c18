"""ORC source/sink, incremental-store compaction, temperature mixture."""

import os

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.packing import (
    sample_mixture,
    temperature_mixture,
    temperature_weights,
)
from geoscan_fraud_spark.sources.io import (
    compact_index,
    load_fixture,
    read_orc,
    write_orc,
)


def test_orc_roundtrip_and_projection(spark, sf_dir, tmp_path):
    docs = load_fixture(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path, columns=["doc_id", "lang"])
    assert back.columns == ["doc_id", "lang"]
    assert back.count() == docs.count()
    full = read_orc(spark, path)
    assert {r["doc_id"] for r in full.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_compact_index_folds_batches_and_keeps_retry_guard(spark, tmp_path):
    store = str(tmp_path / "sigstore")
    rows = spark.range(30).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7).alias("sig")
    )
    for b in range(3):
        rows.filter(F.col("doc_id") % 3 == b).write.mode("overwrite").parquet(
            f"{store}/batch_id={b}"
        )
    before = spark.read.parquet(store)
    assert before.count() == 30
    folded = compact_index(spark, store, target_mb=128)
    assert folded == 2  # batches 0 and 1 fold; the newest (2) stays
    after = spark.read.parquet(store)
    assert after.count() == 30
    assert sorted(
        r["batch_id"] for r in after.select("batch_id").distinct().collect()
    ) == [-1, 2]
    assert os.path.isdir(f"{store}/batch_id=-1")
    # a replay of the newest batch (2) must NOT see its own rows — they
    # were kept out of the base exactly for this
    replay_view = after.filter(F.col("batch_id") < 2)
    assert replay_view.count() == 20
    assert replay_view.filter(F.col("doc_id") % 3 == 2).count() == 0
    # any future batch sees everything
    assert after.filter(F.col("batch_id") < 3).count() == 30
    # a second compaction folds the remaining old batch into the base
    # (2 becomes old once newer batches exist; here keep_last=0 forces it)
    assert compact_index(spark, store, keep_last=0) == 2  # -1 base + batch 2
    final = spark.read.parquet(store)
    assert final.count() == 30
    assert [
        r["batch_id"] for r in final.select("batch_id").distinct().collect()
    ] == [-1]
    # idempotent once fully folded
    assert compact_index(spark, store, keep_last=0) == 0


def test_compact_index_rejects_plain_dirs(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.range(5).write.parquet(path)
    with pytest.raises(ValueError, match="batch_id"):
        compact_index(spark, path)


def test_temperature_weights_limits():
    sizes = {"web": 900, "code": 90, "books": 10}
    t1 = temperature_weights(sizes, 1.0)
    assert t1["web"] == pytest.approx(0.9)
    assert t1["books"] == pytest.approx(0.01)
    flat = temperature_weights(sizes, 1e9)
    for v in flat.values():
        assert v == pytest.approx(1 / 3, abs=1e-3)
    # T<1 sharpens toward the head
    sharp = temperature_weights(sizes, 0.5)
    assert sharp["web"] > t1["web"]
    with pytest.raises(ValueError):
        temperature_weights(sizes, 0.0)
    assert "empty" not in temperature_weights({"a": 10, "empty": 0}, 1.0)


def test_temperature_mixture_matches_manual_weights(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manual = sample_mixture(docs, temperature_weights(sizes, 2.0), 200)
    auto = temperature_mixture(docs, 2.0, 200)
    assert {r["doc_id"] for r in auto.select("doc_id").collect()} == {
        r["doc_id"] for r in manual.select("doc_id").collect()
    }


def test_compact_index_preserves_streaming_dedup(spark, tmp_path):
    """End-to-end with the real sink: compacting the signature store
    between batches must not change dedup decisions — a later batch's
    near-dup of a compacted doc is still dropped."""
    from geoscan_fraud_spark.streaming.scoring import neardup_ingest_sink

    base = " ".join(f"w{i}" for i in range(60))
    other = " ".join(f"y{i}" for i in range(60))
    near = " ".join(w for i, w in enumerate(base.split()) if i % 13 != 5)
    fresh = " ".join(f"z{i}" for i in range(60))

    index_path = str(tmp_path / "c_idx")
    out_path = str(tmp_path / "c_out")
    sink = neardup_ingest_sink(
        index_path, out_path, num_hashes=48, bands=12, threshold=0.5
    )
    sink(spark.createDataFrame([(1, base)], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(2, other)], "doc_id long, text string"), 1)

    # maintenance window: fold batch 0 into the base (batch 1 stays)
    folded = compact_index(spark, index_path)
    assert folded == 1

    sink(
        spark.createDataFrame(
            [(10, near), (11, fresh)], "doc_id long, text string"
        ),
        2,
    )
    corpus = spark.read.parquet(out_path)
    assert sorted(r.doc_id for r in corpus.collect()) == [1, 2, 11]
