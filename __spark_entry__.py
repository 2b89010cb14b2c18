"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship anomaly anti-join (SURVEY §3.2 / §7.4) at
sf0.001. `queries()` / `oracle_sql()` expose the engine's operator
inventory (SURVEY §2) for the DuckDB correctness gate; the registry lives
in `geoscan_fraud_spark.harness`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from geoscan_fraud_spark.operators.scoring import event_anomalies

    return event_anomalies(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import geoscan_fraud_spark.harness_geo  # noqa: F401 — registers geo ops
    import geoscan_fraud_spark.harness_ext  # noqa: F401 — §7.5 extensions
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401 — dedup/ANN/text ops
    from geoscan_fraud_spark.harness import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import geoscan_fraud_spark.harness_geo  # noqa: F401
    import geoscan_fraud_spark.harness_ext  # noqa: F401
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401
    from geoscan_fraud_spark.harness import resolved_oracles

    return resolved_oracles()
