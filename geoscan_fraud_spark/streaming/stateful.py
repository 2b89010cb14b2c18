"""Custom stateful streaming operator — per-user novel-tile detection.

The reference's online store keeps a 7-day sliding set of each user's
active tiles (MongoDB TTL index, `02_geofraud_fraud.py:281-314`) and flags
transactions landing outside it. This module is that pattern as a native
Structured Streaming stateful operator: `applyInPandasWithState` keeps the
per-user tile set in Spark state (grouped by user — state scales
horizontally with the user-key space), emits rows whose tile was not in
the state, and expires state via processing-time timeout as the TTL.

This is the §2.9 "custom stateful operator" capability: where the
stateless `score_stream` join needs a pre-trained tiles table, this one
learns the behavioral envelope online.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geoscan_fraud_spark.functions.grid import cell_id

OUTPUT_SCHEMA = "user string, ts timestamp, latitude double, longitude double, h3 string"
STATE_SCHEMA = "tiles array<string>"


def _make_novel_tiles_fn(ttl_ms: int | None):
    """Build the per-group state function. `ttl_ms=None` means the
    no-timeout configuration: never arm a timeout (calling
    `setTimeoutDuration` under `NoTimeout` raises in Spark)."""

    def _novel_tiles_fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # TTL expiry invocation: no input arrived for ttl_ms — drop
            # the whole envelope and DON'T re-arm, or the state (and its
            # stale novelty suppression) would live forever.
            state.remove()
            yield pd.DataFrame(
                [], columns=["user", "ts", "latitude", "longitude", "h3"]
            )
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        out = []
        # Concatenate the group's chunks BEFORE sorting: the runtime
        # hands a large group as several DataFrame chunks in
        # partition-read order, and sorting each chunk independently
        # made "first occurrence" a function of that arbitrary chunk
        # split (the emitted SET of tiles was stable — the seen-set
        # converges — but WHICH row represented a tile was not). One
        # event-time sort over the whole micro-batch group makes the
        # emitted row the true per-batch earliest; stable mergesort
        # keeps ties deterministic given a deterministic input order
        # (exact same-timestamp ties project to the same tile row in
        # the gate entry's output either way).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            whole = whole.sort_values("ts", kind="mergesort")
            for row in whole.itertuples():
                if row.h3 not in seen:
                    out.append(
                        (user, row.ts, row.latitude, row.longitude, row.h3)
                    )
                    seen.add(row.h3)
        state.update((sorted(seen),))
        if ttl_ms is not None:
            # sliding behavioral window: drop the whole envelope after
            # the TTL of inactivity (per-tile TTL would need timestamped
            # entries; the reference's store expires whole entries the
            # same way)
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            out, columns=["user", "ts", "latitude", "longitude", "h3"]
        )

    return _novel_tiles_fn


def novel_tile_stream(
    stream_df: DataFrame,
    res: int = 10,
    lat_col: str = "latitude",
    lng_col: str = "longitude",
    user_col: str = "user",
    ts_col: str = "ts",
    ttl_ms: int | None = 7 * 24 * 3600 * 1000,
) -> DataFrame:
    """Emit the first occurrence of each (user, tile) — the online novelty
    signal. State = per-user tile set with a `ttl_ms` inactivity TTL
    (default 7 days, the reference store's window).

    TTL caveat measured on Spark 4.1: under
    `GroupStateTimeout.ProcessingTimeTimeout` the stateful operator's
    `shouldRunAnotherBatch` is ALWAYS true (any future processing time
    might fire a timeout), so a `Trigger.AvailableNow` run never reaches
    its termination condition — it loops ~1 s "no new data but cleaning
    up state" micro-batches forever. Pass `ttl_ms=None` for bounded
    (availableNow / once) runs: state then uses `NoTimeout` and the run
    terminates after draining the input. The TTL belongs to the
    continuous production trigger, where an always-true
    shouldRunAnotherBatch is the normal state of affairs.
    """
    pts = stream_df.select(
        F.col(user_col).cast("string").alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(lat_col).cast("double").alias("latitude"),
        F.col(lng_col).cast("double").alias("longitude"),
    ).withColumn("h3", cell_id(F.col("latitude"), F.col("longitude"), res))
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return pts.groupBy("user").applyInPandasWithState(
        _make_novel_tiles_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
