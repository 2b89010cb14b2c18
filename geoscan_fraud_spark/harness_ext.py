"""Harness entries for SURVEY §7.5 extensions: ranking/analytic window
functions on per-user event sequences, rollup, distinct-count variants,
tumbling event-time windows, generation snapshots, and the seeded spatial
sampler (U2 parity).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from geoscan_fraud_spark.harness import _events_coords, _t, register
from geoscan_fraud_spark.operators.sampling import spatial_downsample


# win_rank_per_user was a registered entry through r07's third rotation;
# per-user window-partitioning algebra stays driver-evidenced by the
# hash-green `sessionize` (lag + running sum over the identical
# Window.partitionBy(user_id).orderBy(ts) machinery) and top-k ordering
# by `w1_topk_desc`; the row_number semantics themselves stay pinned
# against a pandas rank in tests/test_ext.py. The slot under the
# driver's 50-entry cap
# now funds `remove_repeated_spans` (round-7 fourth rotation).
def win_rank_per_user(spark, sf_dir):
    """W5 extension — top-3 latest events per user (per-user sequence
    analytics; the window key is the high-cardinality user id, so the
    shuffle is balanced at any scale)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "ts", "rnk")
    )


# win_lag_delta was a registered entry through r06; per-user lag window
# algebra is driver-evidenced by the hash-green `sessionize` (whose
# oracle replays lag + running sum over the same (user_id, ts) window in
# DuckDB), so the slot under the driver's 50-entry cap now funds
# `lm_bigram` (round-7 second rotation).
def win_lag_delta(spark, sf_dir):
    """W5 extension — inter-event value delta per user (lag)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "rollup_counts",
    sql="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(user_id % 5 AS VARCHAR), 'ALL') AS user_bucket,
           count(*) AS cnt
    FROM events GROUP BY ROLLUP(event_type, user_id % 5)
    """,
)
def rollup_counts(spark, sf_dir):
    """Grouping-sets extension — multi-level tile-rollup shape."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 5).cast("string")
    )
    return (
        ev.rollup("event_type", "user_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("user_bucket", F.lit("ALL")).alias("user_bucket"),
            "cnt",
        )
    )


# distinct_users_exact was a registered entry through r07's third
# rotation; distinct-aggregation algebra stays driver-evidenced by the
# hash-green `dedup_minhash` (whose DuckDB replay contains the LSH
# candidate `.distinct()`) and `u3_tfidf_relational` (per-term distinct
# document frequency); the exact counts themselves stay pinned against
# pandas nunique in tests/test_ext.py. The slot under the driver's
# 50-entry cap now funds `ppl_buckets` (round-7 fourth rotation).
def distinct_users_exact(spark, sf_dir):
    """Exact distinct (oracle); `distinct_users_approx` is the 100 TB
    variant (HLL sketch, single pass, no per-key state explosion)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


def distinct_users_approx(spark, sf_dir):
    """approx_count_distinct — deterministic per engine but sketch values
    aren't cross-engine comparable. NOT registered: the driver records at
    most 50 harness rows, and this rows-only twin of the fully-oracled
    `distinct_users_exact` is the evidence we can best afford to keep in
    pytest only (tests/test_ext.py)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx")
    )


# Tumbling-window counts was a registered entry through r06; event-time
# bucket-and-count algebra is driver-evidenced by the hash-green
# `sessionize` (event-time gap windows + per-bucket aggregation) and
# `ttl_window_filter` (event-time interval arithmetic + grouped counts),
# the epoch alignment of F.window vs time_bucket stays pinned by the
# streaming parity test (test_ext.py::test_streaming_tumbling_matches_batch),
# so the slot under the driver's 50-entry cap now funds
# `bpe_tokens_to_ids` (round-7 rotation).
def tumbling_window_counts(spark, sf_dir):
    """Event-time tumbling window (batch form of the streaming agg; both
    engines align buckets to the epoch in UTC)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


@register(
    "generation_latest_snapshot",
    sql="""
    WITH snap AS (
      SELECT user_id, event_type, value, 1 AS generation FROM events
        WHERE event_id % 2 = 0
      UNION ALL
      SELECT user_id, event_type, value, 2 AS generation FROM events
        WHERE event_id % 3 = 0)
    SELECT user_id, event_type,
           CAST(max(generation) AS INT) AS latest_gen, count(*) AS versions
    FROM snap GROUP BY user_id, event_type
    """,
)
def generation_latest_snapshot(spark, sf_dir):
    """Generation-column pattern — the engine's substitute for Delta time
    travel (`01:427`): multi-generation append + latest-wins read."""
    ev = _t(spark, sf_dir, "events")
    g1 = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "event_type", "value", F.lit(1).alias("generation")
    )
    g2 = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "event_type", "value", F.lit(2).alias("generation")
    )
    return (
        g1.unionByName(g2)
        .groupBy("user_id", "event_type")
        .agg(
            F.max("generation").cast("int").alias("latest_gen"),
            F.count(F.lit(1)).alias("versions"),
        )
    )


_RES7_STEP = 1220.629759 / 111320.0


# U2 (the reference's per-cell sample pipeline shape: collect struct
# arrays, slice, explode, dotted access) was a registered entry through
# r06; the struct-array explode + dotted-field algebra is
# driver-evidenced by the hash-green `chunk_documents` (slice +
# posexplode replayed in DuckDB) and `bpe_tokens_to_ids` (posexplode +
# struct-sorted reassembly), and the deterministic-sample semantics stay
# pinned by test_ext.py — so the slot under the driver's 50-entry cap
# now funds `url_features` (round-7 third rotation).
def u2_sample_explode(spark, sf_dir):
    """U2 + P1 parity — the reference's per-cell sample pipeline shape
    (`01:174-191`): collect coordinate structs per cell, take <=10, explode,
    dotted-path access ('sample.latitude'). Deterministic: sort_array
    instead of the reference's unseeded random.sample (SURVEY §5.3).
    The oracle expresses the same result as a window rank."""
    from geoscan_fraud_spark.functions.grid import cell_id

    pts = _events_coords(spark, sf_dir)
    agg = pts.groupBy(
        cell_id(F.col("latitude"), F.col("longitude"), 7).alias("h3")
    ).agg(
        F.sort_array(F.collect_list(F.struct("latitude", "longitude"))).alias("coords")
    )
    exploded = agg.select("h3", F.explode(F.slice("coords", 1, 10)).alias("sample"))
    return exploded.select(
        "h3",
        F.col("sample.latitude").alias("latitude"),
        F.col("sample.longitude").alias("longitude"),
    )


@register(
    "asof_join",
    sql="""
    WITH l AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_id % 2 = 1),
         r AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_id % 2 = 0)
    SELECT l.user_id, l.event_id, l.ts, l.value,
           r.event_id AS ref_event, r.value AS ref_value, r.ts AS ref_ts
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_entry(spark, sf_dir):
    """Scalable as-of join (operators/asof.py): odd events look up the
    most recent even event per user — oracled against DuckDB's native
    ASOF LEFT JOIN. Tie semantics line up because (user_id, ts) is unique
    in the fixture and both engines treat right.ts == left.ts as a match.
    The union-window plan shuffles ONCE on the join key; the naive
    range-join formulation DuckDB optimizes internally is exactly what
    the operator avoids materializing at 100 TB."""
    from geoscan_fraud_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    l = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts", "value"
    )
    r = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(l, r, on=["user_id"], ts_col="ts")
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("event_id_r").alias("ref_event"),
        F.col("value_r").alias("ref_value"),
        F.col("ts_r").alias("ref_ts"),
    )


@register(
    "interval_join",
    sql="""
    SELECT p.event_id, p.value, s.s_suppkey, s.lo, s.hi
    FROM (SELECT event_id, value FROM events WHERE event_id % 20 = 0) p
    JOIN (SELECT s_suppkey,
                 s_acctbal - FLOOR(s_acctbal / 400.0) * 400.0 AS lo,
                 s_acctbal - FLOOR(s_acctbal / 400.0) * 400.0 + 37.5 AS hi
          FROM supplier) s
      ON s.lo <= p.value AND p.value < s.hi
    """,
)
def interval_join_entry(spark, sf_dir):
    """Bucketed interval/range join (operators/asof.py): event values vs
    supplier balance windows folded into the value range (mod 400 — pure
    IEEE floor arithmetic, portable, and non-empty at every sf). The
    oracle states the plain range predicate; the engine executes it as
    the bucket-then-verify equi-join (the J4 cell join on a number line)
    instead of the cartesian product a range predicate plans to."""
    from geoscan_fraud_spark.operators.asof import interval_join

    p = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 20 == 0)
        .select("event_id", "value")
    )
    acct = F.col("s_acctbal")
    lo = acct - F.floor(acct / 400.0) * 400.0
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", lo.alias("lo"), (lo + 37.5).alias("hi")
    )
    return interval_join(
        p, s, point_col="value", start_col="lo", end_col="hi", bucket_width=37.5
    )


def u2_spatial_downsample(spark, sf_dir):
    """U2 parity — the reference's skew sampler (`01:170-198`) as a seeded
    window-rank; deterministic cell counts. NOT registered (50-row driver
    cap): U2 keeps full-SQL evidence via `u2_sample_explode`, the sampler
    itself is exercised inside `geoscan_distributed_fit` and pinned by
    tests/test_ext.py."""
    from geoscan_fraud_spark.functions.grid import cell_id

    pts = _events_coords(spark, sf_dir)
    sampled = spatial_downsample(pts, res=11, max_per_cell=3)
    # deterministic per-cell histogram; the <=cap invariant is asserted in
    # tests (tests/test_ext.py), here the driver records the stable counts
    return (
        sampled.withColumn(
            "h3", cell_id(F.col("latitude"), F.col("longitude"), 11)
        )
        .groupBy("h3")
        .agg(F.count(F.lit(1)).alias("kept"))
    )
