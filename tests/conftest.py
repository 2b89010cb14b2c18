from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from geoscan_fraud_spark import get_spark

    # Per-session temp warehouse: the in-memory catalog dies with the JVM but
    # ./spark-warehouse table directories survive a crash, and a later run's
    # DROP TABLE IF EXISTS is a no-op for them — saveAsTable then fails with
    # LOCATION_ALREADY_EXISTS. A fresh tmp dir makes the suite hermetic
    # against any previously killed session's leftovers.
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    spark = get_spark(
        app_name="geoscan-fraud-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
