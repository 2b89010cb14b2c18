"""SparkSession factory with scale-oriented defaults.

The engine targets large clusters (100 TB-class inputs); tests run on
``local[N]``. Defaults chosen here are the ones that matter at scale:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
* Arrow transport for every pandas/pandas_udf boundary
* broadcast threshold left to Spark/AQE, but all engine joins hint
  ``F.broadcast`` explicitly where a side is known-small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geoscan-fraud-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Env overrides: ``SPARK_GRAFT_MASTER``, ``SPARK_GRAFT_CPUS``,
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
    """
    # Python workers must be able to import this package when they unpickle
    # applyInPandas/mapInPandas closures; make the repo root visible to them
    # regardless of the caller's cwd. (On a real cluster the package is
    # shipped via --py-files / pip instead.)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local[N] runs all N task slots in ONE heap: size it for the slot
        # count or concurrent hash aggregates starve each other
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Some fixture parquet files carry TIMESTAMP(NANOS) columns, which the
        # vectorized reader rejects; read them as long and convert at the scan
        # (see sources.io.load_fixture).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
