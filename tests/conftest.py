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


def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from the measured list (pytest.ini): the
    default run must fit the driver's output-capture budget, so every
    test that measured >= 10 s on local[8] (tests/slow_tests.txt, from
    a full --durations=0 run) is deselectable as a tier — never
    deleted. Unlisted new tests run by default until re-measured."""
    import pathlib

    listed = set(
        pathlib.Path(__file__).with_name("slow_tests.txt").read_text().split()
    )
    for item in items:
        # nodeids are repo-relative ("tests/test_x.py::test_y[param]")
        if item.nodeid in listed:
            item.add_marker(pytest.mark.slow)
