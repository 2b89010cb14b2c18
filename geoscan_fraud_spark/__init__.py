"""geoscan_fraud_spark — a PySpark-native geospatial fraud-analytics engine.

Brand-new implementation of the capabilities of the reference solution
`databricks-industry-solutions/geoscan-fraud` (see SURVEY.md), expressed
Spark-first: DataFrame/SQL plans that Catalyst can optimize, native column
expressions on the hot path, Arrow-batched pandas paths only where Spark
lacks the primitive (convex hulls, per-group DBSCAN, polygon fill).

Layout:
  functions/   grid index (H3-analog), haversine, hulls, polygon fill, text fns
  operators/   Geoscan (distributed + personalized), tiles/TF-IDF, scoring,
               bloom serving, dedup, similarity search, text analysis,
               multimodal plumbing
  sources/     IO: csv/parquet/table sources and sinks, sorted-layout writer
  plans/       plan helpers (explain capture, layout optimization)
  streaming/   foreachBatch scorer + TTL-window helpers
  testing/     deterministic synthetic data generators (transactions fixture)
"""

from geoscan_fraud_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
