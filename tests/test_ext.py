"""Extension-operator invariants: sampler cap, streaming tumbling parity."""

from pyspark.sql import functions as F

from geoscan_fraud_spark.harness import _events_coords
from geoscan_fraud_spark.functions.grid import cell_id
from geoscan_fraud_spark.operators.sampling import spatial_downsample
from geoscan_fraud_spark.sources.io import load_fixture
from geoscan_fraud_spark.streaming.scoring import ensure_event_time


def test_downsample_respects_cap_and_determinism(spark, sf_dir):
    pts = _events_coords(spark, sf_dir)
    s1 = spatial_downsample(pts, res=11, max_per_cell=3)
    over = (
        s1.withColumn("h3", cell_id(F.col("latitude"), F.col("longitude"), 11))
        .groupBy("h3")
        .count()
        .filter(F.col("count") > 3)
        .count()
    )
    assert over == 0
    # deterministic under repartitioning
    s2 = spatial_downsample(pts.repartition(13), res=11, max_per_cell=3)
    assert sorted(r["event_id"] for r in s1.collect()) == sorted(
        r["event_id"] for r in s2.collect()
    )


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked streaming tumbling-window agg == batch window agg."""
    ev = ensure_event_time(load_fixture(spark, sf_dir, "events"), "ts")
    src = str(tmp_path / "ev_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = (
        ensure_event_time(stream, "ts").withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ws"], r["event_type"]): r["cnt"]
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["cnt"]
        for r in ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt")
        .collect()
    }
    assert got == want


def test_win_rank_per_user_matches_pandas(spark, sf_dir):
    """Folded r07: win_rank_per_user left the driver registry (slot funds
    remove_repeated_spans); its per-user row_number semantics stay pinned
    here against an independent pandas rank."""
    from geoscan_fraud_spark.harness_ext import win_rank_per_user

    got = {
        (r["user_id"], r["event_id"]): r["rnk"]
        for r in win_rank_per_user(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    ).toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, True])
    ev["rnk"] = ev.groupby("user_id").cumcount() + 1
    exp = {
        (r.user_id, r.event_id): r.rnk
        for r in ev[ev["rnk"] <= 3].itertuples()
    }
    assert got == exp and len(got) > 0


def test_distinct_users_exact_matches_pandas(spark, sf_dir):
    """Folded r07: distinct_users_exact left the driver registry (slot
    funds ppl_buckets); exact distinct counts stay pinned against pandas
    nunique, and the HLL twin stays within its rsd."""
    from geoscan_fraud_spark.harness_ext import (
        distinct_users_approx,
        distinct_users_exact,
    )

    got = {
        r["event_type"]: r["n_users"]
        for r in distinct_users_exact(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").select("event_type", "user_id").toPandas()
    exp = ev.groupby("event_type")["user_id"].nunique().to_dict()
    assert got == exp and len(got) > 0
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in distinct_users_approx(spark, sf_dir).collect()
    }
    for k, v in exp.items():
        assert abs(approx[k] - v) <= max(3, 0.1 * v)


def test_a2_collect_sorted_matches_pandas(spark, sf_dir):
    """Folded r07: a2_collect_sorted left the driver registry (slot funds
    bpe_ids_roundtrip); its deterministic sorted-collect semantics stay
    pinned against pandas."""
    from geoscan_fraud_spark.harness import a2_collect_sorted

    got = {
        r["user_id"]: r["types"]
        for r in a2_collect_sorted(spark, sf_dir).collect()
    }
    ev = load_fixture(spark, sf_dir, "events").select("user_id", "event_type").toPandas()
    exp = (
        ev.groupby("user_id")["event_type"]
        .apply(lambda s: ",".join(sorted(set(s))))
        .to_dict()
    )
    assert got == exp and len(got) > 0
