"""Stateful streaming operator: per-user novel-tile detection."""

from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.scoring import with_cell
from geoscan_fraud_spark.streaming.stateful import novel_tile_stream
from geoscan_fraud_spark.testing.datagen import make_transactions


def test_novel_tile_stream_emits_first_occurrences(spark, tmp_path):
    pdf = make_transactions(n_users=3, points_per_user=200, seed=9)
    pdf["ts"] = pd_timestamps(len(pdf))
    tx = spark.createDataFrame(pdf)
    src = str(tmp_path / "stateful_src")
    tx.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = novel_tile_stream(stream, res=10)
    q = (
        out.writeStream.format("memory")
        .queryName("novel_tiles")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user, h3 FROM novel_tiles").collect()

    # exactly one emission per distinct (user, tile)
    want = (
        with_cell(tx, res=10)
        .select(F.col("user"), "h3")
        .distinct()
        .count()
    )
    assert len(got) == want
    assert len({(r["user"], r["h3"]) for r in got}) == len(got)


def pd_timestamps(n):
    import pandas as pd

    return pd.date_range("2024-01-01", periods=n, freq="min")
