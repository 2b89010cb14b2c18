"""Append-mode emission pin for the watermarked sliding-window path —
the risk-retirement test the r13 gate-entry design note (COVERAGE.md
§2.9) says to land BEFORE wiring any oracle: a multi-cycle availableNow
run of `sliding_tile_counts` must emit EXACTLY the closed-window set,
accept late rows into still-open windows, and drop rows older than the
watermark — all with fixture-free deterministic timestamps, so a future
DuckDB oracle can replay the emission as static SQL (the per-cycle
watermarks are known constants).

Emission model (pinned here, the fact the oracle design leans on): an
availableNow run ends with a NO-DATA micro-batch that advances the
watermark to (cycle max event time - 30s) and flushes every window that
closed under it IN THE SAME CYCLE — so each cycle's emission set is a
deterministic function of the staged files alone.

Cycle plan (window 60s, slide 30s, watermark 30s; epoch-second stamps):

  file A: u1 rows at t=5, t=20 (same tile), t=70
      cycle 1 -> watermark 40 -> emits [-30,30): visits=2 (t=5,20).
  file B: LATE row t=10 (its [-30,30) window already CLOSED -> skipped
      there, but [0,60) still open -> accepted), plus t=150
      cycle 2 -> watermark 120 -> emits [0,60): visits=3 (t=5,20 + the
      accepted late t=10), [30,90): 1 (t=70), [60,120): 1 (t=70).
  file C: t=220, plus TOO-LATE row t=50 (both its windows end <= 120
      -> dropped entirely, must not resurrect the closed [30,90))
      cycle 3 -> watermark 190 -> emits [120,180): 1 (t=150); t=150's
      other window [150,210) is still open (windows are half-open, so
      t=150 is NOT in [90,150)).

Total emitted across cycles: exactly those five windows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

WIN, SLIDE, WM = "60 seconds", "30 seconds", "30 seconds"
SCHEMA = "ts timestamp, user string, latitude double, longitude double"


def _rows(spark, secs):
    return spark.createDataFrame(
        [
            (f"1970-01-01 00:{s // 60:02d}:{s % 60:02d}", "u1", 40.75, -73.98)
            for s in secs
        ],
        "ts string, user string, latitude double, longitude double",
    ).select(F.col("ts").cast("timestamp"), "user", "latitude", "longitude")


def test_append_mode_emits_exactly_closed_windows(spark, tmp_path):
    from geoscan_fraud_spark.streaming.scoring import sliding_tile_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def cycle():
        stream = spark.readStream.schema(SCHEMA).parquet(src + "/f=*")
        agg = sliding_tile_counts(
            stream, ts_col="ts", user_col="user",
            window=WIN, slide=SLIDE, watermark=WM,
        ).select(
            F.col("window.start").cast("long").alias("w_start"),
            F.col("window.end").cast("long").alias("w_end"),
            "user", "h3", "visits",
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    def emitted():
        try:
            return {
                (r["w_start"], r["w_end"], r["visits"])
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return set()

    _rows(spark, [5, 20, 70]).coalesce(1).write.parquet(src + "/f=a")
    cycle()
    # cycle 1: the closing no-data batch advances the watermark to 40
    # and flushes [-30,30) within the same cycle
    assert emitted() == {(-30, 30, 2)}

    _rows(spark, [10, 150]).coalesce(1).write.parquet(src + "/f=b")
    cycle()
    # cycle 2: t=10 arrives late — skipped for the CLOSED [-30,30)
    # (visits there stay 2) but accepted into the still-open [0,60);
    # watermark advances to 120, closing [0,60), [30,90), [60,120)
    assert emitted() == {
        (-30, 30, 2),
        (0, 60, 3),
        (30, 90, 1),
        (60, 120, 1),
    }

    _rows(spark, [220, 50]).coalesce(1).write.parquet(src + "/f=c")
    cycle()
    # cycle 3: t=50 is older than the watermark (120) — dropped before
    # aggregation, so the already-closed [30,90) is NOT resurrected and
    # no duplicate window rows appear; watermark 190 closes [120,180)
    # while t=150's second window [150,210) stays open
    assert emitted() == {
        (-30, 30, 2),
        (0, 60, 3),
        (30, 90, 1),
        (60, 120, 1),
        (120, 180, 1),
    }
