"""Tiles enrichment pipeline — TF-IDF scoring of personalized tiles.

Re-expresses `01_geofraud_clustering.py:386-431`: treat users as documents
and H3 tiles as terms ("similar to detecting keywords ... in Natural
Language processing", `01:380`):

  document_frequency(h3) = # distinct users whose points hit the tile
  term_frequency(user, h3, cluster) = # of the user's own points in it
  tf_idf = tf * ln(N / df),  N = document_frequency.count()   (`01:382`)

The reference computes tf_idf in a row-at-a-time Python UDF with an
RDD-broadcast scalar (`01:408-413`); here both are native column
expressions — N is constant-folded via `F.lit` (SURVEY §4), so the whole
pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.scoring import with_cell
from geoscan_fraud_spark.sources.io import write_sorted_layout


def tile_tfidf(
    tiles: DataFrame,
    points: DataFrame,
    user_col: str = "user",
    lat_col: str = "latitude",
    lng_col: str = "longitude",
    res: int = 10,
) -> DataFrame:
    """(user, cluster, h3) tiles -> (user, cluster, h3, tf_idf).

    `tiles` from `GeoscanPersonalizedModel.getTiles`; `points` the raw
    transactions. Joins mirror `01:390` (1-key) and `01:401` (2-key).
    """
    points_h3 = with_cell(points, lat_col, lng_col, res).select(user_col, "h3")

    # df: distinct visiting users per tile (`01:389-394`; the drop('user')
    # at 01:389 makes the tile side user-agnostic)
    tile_cells = tiles.select("h3").distinct()
    document_frequency = (
        tile_cells.join(points_h3, ["h3"])
        .select(user_col, "h3")
        .distinct()
        .groupBy("h3")
        .agg(F.sum(F.lit(1)).alias("df"))
    )
    # tf: user's own visits to their own tiles (`01:399-403`, 3-key group)
    term_frequency = (
        tiles.join(points_h3, ["h3", user_col])
        .groupBy(user_col, "h3", "cluster")
        .agg(F.sum(F.lit(1)).alias("tf"))
    )
    # document_frequency is consumed twice: the N count below and the final
    # join — materialize it once (it is per-tile counts, tiny at any scale)
    document_frequency = document_frequency.localCheckpoint(eager=True)
    # N via F.lit constant folding — replaces sc.broadcast (`01:408-409`)
    n = document_frequency.count()
    return (
        term_frequency.join(document_frequency, ["h3"])
        .withColumn("tf_idf", F.col("tf") * F.log(F.lit(float(n)) / F.col("df")))
        .select(user_col, "cluster", "h3", "tf_idf")
    )


def save_tiles_table(tiles_scored: DataFrame, path: str, user_col: str = "user") -> None:
    """S7 — persist with the ZORDER-approximating layout on (user, h3)
    (`01:440`: 'faster lookup ... user and H3 access')."""
    write_sorted_layout(tiles_scored, path, [user_col, "h3"])


def cluster_popularity(tiles_scored: DataFrame) -> DataFrame:
    """A5 — max tf_idf per cluster (`01:454`, choropleth weights)."""
    return tiles_scored.groupBy("cluster").agg(F.max("tf_idf").alias("tf_idf"))
