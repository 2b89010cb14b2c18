"""Regression tests for the round-2 review fixes: portable-session reads,
md5/xxhash64 minhash parity, adaptive simhash blocking, ring wraparound,
stateful-timeout expiry, and worst-case-latitude DBSCAN bucketing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.functions.dbscan_local import local_dbscan
from geoscan_fraud_spark.functions.grid import ring_cells
from geoscan_fraud_spark.operators.dedup import minhash_dedup, simhash_pairs
from geoscan_fraud_spark.sources.io import load_fixture


def test_minhash_md5_matches_xxhash64_kept_set(spark, sf_dir):
    """The md5 signature variant (driver-oracle path) and the xxhash64
    default (100 TB path) are independent LSH hash families: each may miss
    a few candidate pairs (recall < 1 by design), but both verify with
    exact Jaccard, so their kept sets must agree on the overwhelming
    majority of documents."""
    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    words = F.split(F.col("text"), r"\s+")
    mutated = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat_ws(" ", F.filter(words, lambda w, i: (i % 13) != 5)).alias("text"),
    )
    both = docs.unionByName(mutated)
    n_docs = both.count()
    kept_xx = {
        r["doc_id"]
        for r in minhash_dedup(both, threshold=0.5, num_hashes=48, bands=12).collect()
    }
    kept_md5 = {
        r["doc_id"]
        for r in minhash_dedup(
            both, threshold=0.5, num_hashes=48, bands=12, sig_hash="md5"
        ).collect()
    }
    # no false positives on either side (verify stage is exact), so any
    # disagreement is LSH recall noise. At jaccard≈0.6 the 12-band/r=4
    # collision probability is ~0.8 per family, so allow each family to
    # miss a sliver the other catches — bound the symmetric difference
    # at 10% of the corpus
    assert len(kept_xx ^ kept_md5) <= 0.10 * n_docs


def test_simhash_blocking_complete_for_configured_distance(spark, sf_dir):
    """Pigeonhole blocking must find EVERY pair within max_hamming, not
    just those within 3: compare against a brute-force hamming join."""
    from geoscan_fraud_spark.operators.dedup import simhash_table

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    sig = simhash_table(docs).persist()
    a = sig.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sig.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    for max_h in (3, 6):
        brute = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_h)
        )
        expected = {(r["id_a"], r["id_b"]) for r in brute.collect()}
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(docs, max_hamming=max_h).collect()
        }
        assert got == expected, f"max_hamming={max_h}"
    sig.unpersist()


def test_simhash_rejects_unblockable_distance():
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(None, max_hamming=40)


def test_ring_cells_wrap_antimeridian(spark):
    """A 1-ring at lng≈-180 must produce 9 well-formed ids, and must share
    cells with the ring of its physical neighbor across the seam."""
    df = spark.createDataFrame(
        [(1, 10.0, -179.9999), (2, 10.0, 179.9999)], "id int, lat double, lng double"
    )
    rings = {
        r["id"]: set(r["cells"])
        for r in df.select(
            "id", ring_cells(F.col("lat"), F.col("lng"), 7, 1, 1).alias("cells")
        ).collect()
    }
    for cells in rings.values():
        assert len(cells) == 9
        assert all(len(c) == 16 and "-" not in c for c in cells)
    # the two points are ~20 m apart across the seam: rings must overlap
    assert rings[1] & rings[2]


def test_ring_cells_clamps_poles(spark):
    """Past-the-pole rows are dropped, not emitted as malformed ids."""
    df = spark.createDataFrame([(1, 89.9999, 0.0)], "id int, lat double, lng double")
    cells = df.select(
        ring_cells(F.col("lat"), F.col("lng"), 7, 1, 1).alias("c")
    ).first()["c"]
    assert 6 <= len(cells) <= 9
    assert all(len(c) == 16 and "-" not in c for c in cells)


def test_stateful_timeout_drops_state():
    """On a timeout invocation the per-user envelope is removed and NOT
    re-armed (the round-1 bug kept state alive forever)."""
    from geoscan_fraud_spark.streaming.stateful import _make_novel_tiles_fn

    _novel_tiles_fn = _make_novel_tiles_fn(7 * 24 * 3600 * 1000)

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (["0A00010200000103"],)

        def __init__(self):
            self.removed = False
            self.updated = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = True

        def setTimeoutDuration(self, ms):
            self.updated = True

        def getCurrentProcessingTimeMs(self):
            return 0

    st = FakeState()
    out = list(_novel_tiles_fn(("u1",), iter([]), st))
    assert st.removed and not st.updated
    assert len(out) == 1 and len(out[0]) == 0


def test_local_dbscan_wide_latitude_group():
    """Two within-epsilon points at high latitude must cluster even when
    the group's MEAN latitude is much lower (the round-1 bug sized
    longitude buckets with cos(mean lat), under-covering high latitudes)."""
    eps = 100.0
    # ~90 m apart in longitude at lat 70 (cos 70 ≈ 0.342)
    dlng = 90.0 / (111_320.0 * 0.342)
    lat = np.array([70.0, 70.0] + [0.0] * 20)
    lng = np.array([0.0, dlng] + list(np.linspace(10, 30, 20)))
    labels = local_dbscan(lat, lng, epsilon_m=eps, min_pts=1)
    assert labels[0] == labels[1] != -1


def test_polyfill_dilation_never_emits_malformed_ids():
    import json

    from geoscan_fraud_spark.functions.polyfill import polyfill

    geom = json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [
                    [-179.9999, 10.0],
                    [-179.9995, 10.0],
                    [-179.9995, 10.0004],
                    [-179.9999, 10.0004],
                    [-179.9999, 10.0],
                ]
            ],
        }
    )
    cells = polyfill(geom, 11, layers=2)
    assert cells and all(len(c) == 16 and "-" not in c for c in cells)


def test_redact_pii(spark):
    from geoscan_fraud_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe@example.com or call 555-867-5309 now"),
            (2, "server at 10.0.0.1 leaked ssn 123-45-6789"),
            (3, "clean document with no sensitive spans"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
    assert "jane.doe" not in out[1]["redacted"]
    assert "<IP>" in out[2]["redacted"] and "<SSN>" in out[2]["redacted"]
    assert out[1]["n_redactions"] == 2
    assert out[2]["n_redactions"] == 2
    assert out[3]["n_redactions"] == 0
    assert out[3]["redacted"] == "clean document with no sensitive spans"


def test_epsilon_pairs_complete_at_finer_resolution(spark, sf_dir):
    """The pairing join must return the IDENTICAL pair set at any finer
    resolution (the ring count adapts to cover epsilon) — finer cells are
    purely a candidate-pruning lever, never a recall change."""
    from geoscan_fraud_spark.functions.grid import res_for_epsilon
    from geoscan_fraud_spark.harness import _events_coords
    from geoscan_fraud_spark.operators.geoscan import epsilon_pairs

    eps = 150.0
    pts = (
        _events_coords(spark, sf_dir)
        .groupBy(F.col("latitude").alias("lat"), F.col("longitude").alias("lng"))
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("id", F.xxhash64("lat", "lng"))
    ).persist()
    base_res = res_for_epsilon(eps)
    expected = {
        (r["id_a"], r["id_b"])
        for r in epsilon_pairs(pts, eps).select("id_a", "id_b").collect()
    }
    assert expected
    for res in (base_res + 1, base_res + 2):
        got = {
            (r["id_a"], r["id_b"])
            for r in epsilon_pairs(pts, eps, res=res).select("id_a", "id_b").collect()
        }
        assert got == expected, f"res={res}"
    pts.unpersist()


def test_sessionize(spark):
    from datetime import datetime

    from geoscan_fraud_spark.operators.sessions import session_stats, sessionize

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    df = spark.createDataFrame(
        [
            (1, t(0)), (1, t(10)), (1, t(50)), (1, t(55)),  # gap at 10->50
            (2, t(0)),
        ],
        "user_id long, ts timestamp",
    )
    out = sessionize(df, gap_seconds=1800).collect()
    sess = {(r["user_id"], r["ts"].minute): r["session_id"] for r in out}
    assert sess[(1, 0)] == 0 and sess[(1, 10)] == 0
    assert sess[(1, 50)] == 1 and sess[(1, 55)] == 1
    assert sess[(2, 0)] == 0

    stats = {
        (r["user_id"], r["session_id"]): r
        for r in session_stats(df, gap_seconds=1800).collect()
    }
    assert stats[(1, 0)]["n_events"] == 2 and stats[(1, 0)]["duration_s"] == 600
    assert stats[(1, 1)]["n_events"] == 2 and stats[(1, 1)]["duration_s"] == 300
    assert stats[(2, 0)]["n_events"] == 1 and stats[(2, 0)]["duration_s"] == 0

    # single physical window: exactly one exchange in the plan
    from geoscan_fraud_spark.plans.audit import plan_summary

    assert plan_summary(sessionize(df))["shuffles"] == 1
