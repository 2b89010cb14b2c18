"""End-to-end fraud pipeline golden invariants (SURVEY §5.2.2, §5.2.4):
fit -> getTiles -> tf-idf -> anti-join scoring -> bloom serving parity.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.bloom import (
    BloomFilter,
    H3Lookup,
    score_with_blooms,
    train_blooms,
)
from geoscan_fraud_spark.operators.personalized import GeoscanPersonalized
from geoscan_fraud_spark.operators.scoring import (
    extract_anomalies,
    extract_anomalies_literal,
)
from geoscan_fraud_spark.operators.tiles import cluster_popularity, tile_tfidf
from geoscan_fraud_spark.testing.datagen import make_transactions

PRECISION = 10
LAYERS = 2


@pytest.fixture(scope="module")
def pipeline(spark):
    pdf = make_transactions(n_users=4, points_per_user=700, seed=21)
    tx = spark.createDataFrame(pdf)
    model = (
        GeoscanPersonalized().setEpsilon(100.0).setMinPts(5).setGroupedCol("user").fit(tx)
    )
    tiles = model.getTiles(PRECISION, LAYERS).persist()
    scored_tiles = tile_tfidf(tiles, tx, res=PRECISION).persist()
    anomalies = extract_anomalies(tx, tiles, res=PRECISION).persist()
    return dict(pdf=pdf, tx=tx, model=model, tiles=tiles,
                scored_tiles=scored_tiles, anomalies=anomalies)


def test_anomalies_are_points_outside_tiles(pipeline):
    """transform-NULL rows == anti-join rows (the `02:62-68` invariant)."""
    tx, tiles = pipeline["tx"], pipeline["tiles"]
    n_anti = pipeline["anomalies"].count()
    n_literal = extract_anomalies_literal(tx, tiles, res=PRECISION).count()
    assert n_anti == n_literal
    assert 0 < n_anti < tx.count()  # noise exists, but most points are known


def test_tfidf_positive_and_joined(pipeline):
    st = pipeline["scored_tiles"]
    assert st.filter(F.col("tf_idf") < 0).count() == 0
    assert set(st.columns) == {"user", "cluster", "h3", "tf_idf"}
    pop = cluster_popularity(st)
    assert pop.count() > 0


def test_bloom_fnr_zero(pipeline, spark):
    """FNR must be 0 (`02:141-147`): a transaction in a *known* tile is
    NEVER flagged — blooms cannot false-negative on inserted items."""
    tx, tiles, anomalies = pipeline["tx"], pipeline["tiles"], pipeline["anomalies"]
    blooms = train_blooms(tiles, fpr=0.01).persist()
    known = tx.join(
        anomalies.select("user", "latitude", "longitude"),
        ["user", "latitude", "longitude"],
        "left_anti",
    )
    scored = score_with_blooms(known, blooms, precision=PRECISION)
    assert scored.filter(F.col("anomaly") == 1).count() == 0


def test_bloom_recall_vs_batch(pipeline, spark):
    """The 78-of-81 relation (`02:258`): bloom catches almost all batch
    anomalies; misses are bloom false positives, bounded by the ~1% FPR
    (binomial slack applied)."""
    tiles, anomalies = pipeline["tiles"], pipeline["anomalies"]
    blooms = train_blooms(tiles, fpr=0.01)
    scored = score_with_blooms(anomalies, blooms, precision=PRECISION)
    n = scored.count()
    flagged = scored.filter(F.col("anomaly") == 1).count()
    assert flagged >= n * 0.95  # miss rate well under 5%


def test_pandas_scorer_matches_distributed(pipeline, spark):
    """Serving parity (§5.2.4): pyfunc-style pandas path == mapInPandas path."""
    tx, tiles = pipeline["tx"], pipeline["tiles"]
    blooms_df = train_blooms(tiles, fpr=0.01)
    lookup = H3Lookup.from_model_df(blooms_df, precision=PRECISION)
    sample = tx.limit(500).toPandas()
    local = lookup.predict(sample)
    dist = (
        score_with_blooms(spark.createDataFrame(sample), blooms_df, precision=PRECISION)
        .toPandas()
    )
    key = ["user", "latitude", "longitude"]
    merged = local.merge(dist, on=key, suffixes=("_l", "_d"))
    assert (merged["anomaly_l"] == merged["anomaly_d"]).all()


def test_unseen_user_anomaly(pipeline, spark):
    """`bu:35` KeyError fixed: unseen users score anomaly=1."""
    blooms_df = train_blooms(pipeline["tiles"], fpr=0.01)
    stranger = spark.createDataFrame(
        [("nobody", 40.75, -74.0, 9.99)], ["user", "latitude", "longitude", "amount"]
    )
    row = score_with_blooms(stranger, blooms_df, precision=PRECISION).collect()[0]
    assert row["anomaly"] == 1
    lookup = H3Lookup.from_model_df(blooms_df, precision=PRECISION)
    out = lookup.predict(
        pd.DataFrame({"user": ["nobody"], "latitude": [40.75], "longitude": [-74.0]})
    )
    assert out["anomaly"].iloc[0] == 1


def test_bloom_roundtrip():
    bf = BloomFilter(100, 0.01)
    items = [f"CELL{i:08X}" for i in range(100)]
    bf.update(items)
    raw = bf.to_bytes()
    bf2 = BloomFilter.from_bytes(raw)
    assert all(i in bf2 for i in items)
    fp = sum(f"OTHER{i}" in bf2 for i in range(10000))
    assert fp < 300  # ~1% + slack


def test_streaming_scores_match_batch(pipeline, spark, tmp_path):
    """foreachBatch/stream-static path produces the same anomaly set as
    the batch anti-join (§2.9 parity)."""
    tx, tiles = pipeline["tx"], pipeline["tiles"]
    src = str(tmp_path / "stream_src")
    tx.limit(800).coalesce(1).write.mode("overwrite").parquet(src)

    from geoscan_fraud_spark.streaming.scoring import score_stream

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    scored = score_stream(stream, tiles, res=PRECISION)
    q = (
        scored.writeStream.format("memory")
        .queryName("anomalies_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM anomalies_stream").collect()[0]["n"]
    want = extract_anomalies(
        spark.read.parquet(src), tiles, res=PRECISION
    ).count()
    assert got == want
