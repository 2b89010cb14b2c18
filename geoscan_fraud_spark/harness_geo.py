"""Harness entries for the non-SQL-expressible geo operators.

Density clustering (iterative connected components), polygon fill, and
bloom scoring have no DuckDB oracle — the driver records rows-only checks
for these (the semantics are pinned by the property tests in
tests/test_geoscan.py and tests/test_pipeline.py instead). Inputs are
deterministic coordinates derived from the events fixture, so row counts
are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscan_fraud_spark.harness import _events_coords, register
from geoscan_fraud_spark.operators.bloom import score_with_blooms, train_blooms
from geoscan_fraud_spark.operators.geoscan import Geoscan
from geoscan_fraud_spark.operators.personalized import GeoscanPersonalized
from geoscan_fraud_spark.operators.sampling import spatial_downsample
from geoscan_fraud_spark.operators.scoring import extract_anomalies
from geoscan_fraud_spark.operators.tiles import tile_tfidf

EPS_M = 60.0
MIN_PTS = 8


def _dense_points(spark, sf_dir):
    """Events projected into a ~1 km² box — dense enough to cluster."""
    pts = _events_coords(spark, sf_dir)
    v = F.col("latitude") * 1000.0  # spread over [40500, 40700]
    return pts.select(
        F.col("event_id"),
        (F.col("user_id") % 10).cast("string").alias("user"),
        (F.lit(40.70) + (v - F.floor(v / 11.0) * 11.0) / 1000.0).alias("latitude"),
        (F.lit(-74.00) + (v - F.floor(v / 7.0) * 7.0) / 700.0).alias("longitude"),
    )


@register("ref_csv_unclustered")
def ref_csv_unclustered(spark, sf_dir):
    """Golden parity run on the reference's OWN shipped dataset
    (`/root/reference/data/transactions.csv`, read-only): distributed fit
    at the reference's logged params epsilon=200 / minPts=20
    (`01_geofraud_clustering.py:129-130`) and return the transactions left
    unclustered. The stable row count (1,727) is the driver-visible
    invariant matching the reference prose's "~2,000 non-clustered
    transactions" (`01:227`); rows-only (iterative CC is not
    SQL-expressible, and the input is a CSV outside the fixture views).
    """
    from geoscan_fraud_spark.operators.geoscan import Geoscan
    from geoscan_fraud_spark.sources.io import TRANSACTIONS_SCHEMA, read_csv

    df = read_csv(spark, "/root/reference/data/transactions.csv", TRANSACTIONS_SCHEMA)
    model = Geoscan().setEpsilon(200.0).setMinPts(20).fit(df)
    return (
        model.transform(df)
        .filter(F.col("cluster").isNull())
        .select("user", "latitude", "longitude", "amount")
    )


@register("geoscan_distributed_fit")
def geoscan_distributed_fit(spark, sf_dir):
    """M2 — distributed fit; output = per-cluster sizes (deterministic)."""
    pts = spatial_downsample(_dense_points(spark, sf_dir), res=11, max_per_cell=5)
    model = Geoscan().setEpsilon(EPS_M).setMinPts(MIN_PTS).fit(pts)
    return model.polygons.select("cluster", "n_points").orderBy("cluster")


@register("geoscan_personalized_tiles")
def geoscan_personalized_tiles(spark, sf_dir):
    """M7/M9 — per-group fit + getTiles; output = tile counts per user."""
    pts = _dense_points(spark, sf_dir)
    model = (
        GeoscanPersonalized()
        .setEpsilon(80.0)
        .setMinPts(5)
        .setGroupedCol("user")
        .fit(pts)
    )
    tiles = model.getTiles(11, 1)
    return (
        tiles.groupBy("user")
        .agg(F.count(F.lit(1)).alias("n_tiles"))
        .orderBy("user")
    )


@register("geoscan_score_pipeline")
def geoscan_score_pipeline(spark, sf_dir):
    """M10 + flagship + bloom: fit -> tiles -> tf-idf -> anti-join + bloom
    scoring; output = per-user anomaly counts from both paths."""
    # pts feeds fit, tf-idf (twice), the anti-join, and bloom scoring
    pts = _dense_points(spark, sf_dir).persist()
    model = (
        GeoscanPersonalized()
        .setEpsilon(80.0)
        .setMinPts(5)
        .setGroupedCol("user")
        .fit(pts)
    )
    tiles = model.getTiles(11, 1).persist()
    scored_tiles = tile_tfidf(tiles, pts, res=11)
    anomalies = extract_anomalies(pts, tiles, res=11)
    blooms = train_blooms(tiles, fpr=0.01)
    bloom_scored = score_with_blooms(pts, blooms, precision=11)
    anti = anomalies.groupBy("user").agg(F.count(F.lit(1)).alias("anti_anomalies"))
    blm = (
        bloom_scored.filter(F.col("anomaly") == 1)
        .groupBy("user")
        .agg(F.count(F.lit(1)).alias("bloom_anomalies"))
    )
    n_tfidf = scored_tiles.count()
    return (
        anti.join(blm, "user", "full_outer")
        .withColumn("tfidf_rows", F.lit(n_tfidf))
        .orderBy("user")
    )
