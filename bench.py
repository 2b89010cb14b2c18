"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number mirrors BASELINE.md's "< 5 s anomaly anti-join"; each
query is timed to full materialization (count() action) after a warm-up of
the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from geoscan_fraud_spark import get_spark
    import geoscan_fraud_spark.harness_geo  # noqa: F401
    import geoscan_fraud_spark.harness_ext  # noqa: F401
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401
    from geoscan_fraud_spark.harness import QUERIES

    spark = get_spark(app_name="geoscan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "flagship_event_anomalies",
        "j1_join_single_key",
        "j2_join_two_keys",
        "u3_tfidf_relational",
        "u1_cell_id",
        "u7_haversine",
        "a8_percentiles",
        "w1_topk_desc",
        "u4_explode_tokens",
        "ttl_window_filter",
        "geoscan_score_pipeline",
        "dedup_minhash",
        "dedup_simhash",
        "ann_cosine_topk",
        "text_token_stats",
        "text_winnow_fingerprint",
    ]
    headline = [q for q in headline if q in QUERIES]

    # warm up the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
