"""Regression tests for the round-3 review fixes: lazy IVF oracle
resolution, high-latitude pairing completeness at densified resolutions,
simhash max_hamming=0, redact_pii counting on the original text, the
2-key getTiles cache, and the j1 broadcast-hint removal."""

import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.functions.geo import haversine_m


# ---------------------------------------------------------------------------
# lazy oracle resolution (harness single-point-of-failure fix)
# ---------------------------------------------------------------------------


def test_ivf_oracle_is_lazy_and_resolves():
    """Importing the registry must not read fixture files; the IVF oracle
    is a thunk resolved by `resolved_oracles()` into runnable SQL."""
    import geoscan_fraud_spark.harness_pipeline  # noqa: F401
    from geoscan_fraud_spark.harness import ORACLES, resolved_oracles

    assert callable(ORACLES["ann_ivf_topk"])
    resolved = resolved_oracles()
    assert isinstance(resolved["ann_ivf_topk"], str)
    assert "list_dot_product" in resolved["ann_ivf_topk"]


def test_failing_oracle_thunk_degrades_to_rows_only():
    """A thunk that raises must drop ITS entry, not poison the dict."""
    from geoscan_fraud_spark.harness import ORACLES, resolved_oracles

    def boom() -> str:
        raise FileNotFoundError("fixture moved")

    ORACLES["__test_boom__"] = boom
    try:
        resolved = resolved_oracles()
        assert "__test_boom__" not in resolved
        assert "flagship_event_anomalies" in resolved
    finally:
        del ORACLES["__test_boom__"]


# ---------------------------------------------------------------------------
# high-latitude pairing completeness (lng ring cap scales with resolution)
# ---------------------------------------------------------------------------


def test_epsilon_pairs_high_latitude_densified(spark):
    """At |lat| ~ 83 deg the longitude ring count at the auto-densified
    res0+1 exceeds the old fixed cap of 16 — the scaled cap must keep the
    pair set identical to brute-force haversine at every resolution."""
    from geoscan_fraud_spark.functions.grid import res_for_epsilon
    from geoscan_fraud_spark.operators.geoscan import epsilon_pairs

    eps = 150.0
    # a tight cluster at lat 83 straddling the antimeridian, plus controls
    # at lat 85 and one clear outlier
    coords = [
        (83.0001, 179.9990),
        (83.0002, 179.9998),
        (83.0001, -179.9995),
        (83.0003, -179.9988),
        (85.0001, 10.0001),
        (85.0002, 10.0008),
        (40.0, 40.0),
    ]
    pts = (
        spark.createDataFrame(coords, "lat double, lng double")
        .withColumn("w", F.lit(1))
        .withColumn("id", F.xxhash64("lat", "lng"))
    ).persist()

    a = pts.select(F.col("id").alias("id_a"), F.col("lat").alias("la"), F.col("lng").alias("lo"))
    b = pts.select(F.col("id").alias("id_b"), F.col("lat").alias("lb"), F.col("lng").alias("lb2"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            haversine_m(F.col("la"), F.col("lo"), F.col("lb"), F.col("lb2"))
            <= F.lit(eps)
        )
        .collect()
    }
    assert truth  # the clusters do produce within-epsilon pairs

    base = res_for_epsilon(eps)
    for res in (base, base + 1, base + 2):
        got = {
            (r["id_a"], r["id_b"])
            for r in epsilon_pairs(pts, eps, res=res).select("id_a", "id_b").collect()
        }
        assert got == truth, f"res={res}"
    pts.unpersist()


# ---------------------------------------------------------------------------
# simhash max_hamming=0
# ---------------------------------------------------------------------------


def test_simhash_max_hamming_zero(spark):
    """max_hamming=0 is the exact-signature-duplicate join: one width-64
    chunk whose mask must not overflow the long literal."""
    from geoscan_fraud_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "a completely different document about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    pairs = simhash_pairs(df, max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["hamming"] == 0 for r in pairs)


# ---------------------------------------------------------------------------
# redact_pii counts spans on the pre-replacement text
# ---------------------------------------------------------------------------


def test_redact_pii_preexisting_markers_not_counted(spark):
    from geoscan_fraud_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "already sanitized: <EMAIL> <PHONE> <SSN> plus jane@example.com"),
            (2, "<CARD> markers only, nothing real to redact"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_redactions"] == 1  # only the real email
    assert "jane@example.com" not in out[1]["redacted"]
    assert out[2]["n_redactions"] == 0
    assert out[2]["redacted"] == "<CARD> markers only, nothing real to redact"


# ---------------------------------------------------------------------------
# getTiles keeps the 2 most recent keys persisted
# ---------------------------------------------------------------------------


def test_gettiles_cache_keeps_two_keys(spark):
    import numpy as np
    import pandas as pd

    from geoscan_fraud_spark.operators.geoscan import Geoscan

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "latitude": 40.7 + rng.normal(0, 0.0005, 120),
            "longitude": -74.0 + rng.normal(0, 0.0005, 120),
        }
    )
    model = Geoscan().setEpsilon(200).setMinPts(3).fit(spark.createDataFrame(pdf))
    t_a = model.getTiles(10, 0)
    t_b = model.getTiles(11, 0)
    assert set(model._tiles_cache) == {(10, 0), (11, 0)}
    # alternating between the two cached keys must not evict either
    assert model.getTiles(10, 0) is t_a
    assert model.getTiles(11, 0) is t_b
    assert set(model._tiles_cache) == {(10, 0), (11, 0)}
    # a third key evicts the least recently used one, (10, 0)
    model.getTiles(12, 0)
    assert set(model._tiles_cache) == {(11, 0), (12, 0)}
    # evicted handles remain correct via lineage
    assert t_a.count() > 0
    model.unpersistTiles()


# ---------------------------------------------------------------------------
# j1 leaves the customer join strategy to the optimizer
# ---------------------------------------------------------------------------


def test_j1_no_forced_customer_broadcast(spark, sf_dir):
    """Exactly one broadcast hint (nation, fixed 25 rows) survives in the
    analyzed plan; customer (user-proportional) carries none.

    (j1 folded out of the driver registry r08 — imported directly.)"""
    from geoscan_fraud_spark.harness import j1_join_single_key

    df = j1_join_single_key(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.lower().count("broadcast") == 1
