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


def test_dedup_stream_emits_first_occurrence_only(spark, tmp_path):
    import pandas as pd

    from geoscan_fraud_spark.streaming.scoring import dedup_stream

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 1, 3, 2, 1, 4],
            "text": list("aba cb aa".replace(" ", "")),
            "ts": pd.date_range("2024-01-01", periods=7, freq="min"),
        }
    )
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = dedup_stream(stream, ["doc_id"], ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_stream_t").collect())
    assert got == [1, 2, 3, 4]
