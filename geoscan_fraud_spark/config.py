"""YAML application config — parity with the reference's config pattern.

The reference drives database/table/model names from a YAML file
(`config/application.yaml:1-9`) materialized by
`config/configure_notebook.py:11-27` (load YAML → CREATE DATABASE ...
LOCATION → USE db). Same shape here; paths are engine-local.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from geoscan_fraud_spark.sources.io import create_database, drop_database

DEFAULT_CONFIG = {
    "database": {
        "name": "geoscan_spark",
        "path": None,
        "tables": {"tiles": "tiles"},
    },
    "model": {"name": "geoscan_spark", "path": "/tmp/geoscan_spark/model"},
}


@dataclass
class AppConfig:
    database_name: str
    database_path: str | None
    tables: dict[str, str]
    model_name: str
    model_path: str
    raw: dict = field(default_factory=dict)

    def table(self, key: str) -> str:
        """Fully-qualified table name (e.g. config.table('tiles'))."""
        return f"{self.database_name}.{self.tables[key]}"


def load_config(path: str | None = None) -> AppConfig:
    """Load YAML (or JSON) config; falls back to defaults when absent."""
    raw = dict(DEFAULT_CONFIG)
    if path:
        with open(path) as f:
            text = f.read()
        try:
            import yaml

            raw = yaml.safe_load(text)
        except ImportError:  # pragma: no cover - yaml is present in this env
            raw = json.loads(text)
    db = raw.get("database", {})
    model = raw.get("model", {})
    return AppConfig(
        database_name=db.get("name", "geoscan_spark"),
        database_path=db.get("path"),
        tables=db.get("tables", {"tiles": "tiles"}),
        model_name=model.get("name", "geoscan_spark"),
        model_path=model.get("path", "/tmp/geoscan_spark/model"),
        raw=raw,
    )


def init_database(spark: SparkSession, config: AppConfig) -> None:
    """CREATE DATABASE IF NOT EXISTS ... [LOCATION] + USE (`cn:18-27`)."""
    create_database(spark, config.database_name, config.database_path)


def teardown(spark: SparkSession, config: AppConfig) -> None:
    """DROP DATABASE CASCADE + path cleanup (`cn:44-48`)."""
    spark.sql("USE default")
    drop_database(spark, config.database_name, config.database_path)
