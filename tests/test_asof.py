"""As-of join vs the pandas.merge_asof oracle."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoscan_fraud_spark.operators.asof import asof_join
from geoscan_fraud_spark.sources.io import load_fixture


@pytest.fixture(scope="module")
def sides(spark, sf_dir):
    # left = every 3rd event; right = every 7th event as the "state" feed
    ev = load_fixture(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", F.col("value").alias("lv")
    )
    right = ev.filter(F.col("event_id") % 7 == 0).select(
        "user_id", "ts", F.col("value").alias("state")
    )
    return left, right


def _pd(df):
    p = df.toPandas()
    p["ts"] = pd.to_datetime(p["ts"])
    return p


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, sides, direction):
    left, right = sides
    got = asof_join(left, right, on=["user_id"], ts_col="ts", direction=direction)
    gp = _pd(got).sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)

    lp = _pd(left).sort_values("ts")
    rp = _pd(right).sort_values("ts")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction=direction, suffixes=("", "_r")
    ).sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)

    assert len(gp) == len(exp)
    assert gp["state_r"].fillna(-1).tolist() == exp["state"].fillna(-1).tolist()
    # matched right timestamp respects the direction inequality
    m = gp.dropna(subset=["ts_r"])
    if direction == "backward":
        assert (m["ts_r"] <= m["ts"]).all()
    else:
        assert (m["ts_r"] >= m["ts"]).all()


def test_asof_join_single_shuffle(spark, sides):
    left, right = sides
    plan = (
        asof_join(left, right, on=["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # one exchange for the (key)-partitioned window; the union sides
    # read map-side (no join operator at all in the plan)
    assert "Join" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_interval_join_matches_python_reference(spark, sf_dir):
    from geoscan_fraud_spark.operators.asof import interval_join

    ev = load_fixture(spark, sf_dir, "events")
    points = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id", F.col("value").alias("v")
    )
    intervals = ev.filter(F.col("event_id") % 11 == 0).select(
        F.col("event_id").alias("iv_id"),
        (F.col("value") - 3.0).alias("start"),
        (F.col("value") + 2.0).alias("end"),
    )
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(points, intervals, "v").collect()
    }
    pts = [(r["event_id"], r["v"]) for r in points.collect()]
    ivs = [(r["iv_id"], r["start"], r["end"]) for r in intervals.collect()]
    expect = {
        (pid, iid)
        for pid, v in pts
        for iid, s, e in ivs
        if s <= v < e
    }
    assert got == expect
    assert len(got) > 0  # workload actually overlaps

    # left join keeps unmatched points exactly once
    left = interval_join(points, intervals, "v", how="left")
    n_matchless = len({p for p, _ in got})  # points with >=1 match
    assert left.count() == len(got) + (points.count() - n_matchless)


def test_interval_join_no_cartesian_in_plan(spark, sf_dir):
    from geoscan_fraud_spark.operators.asof import interval_join

    ev = load_fixture(spark, sf_dir, "events")
    points = ev.select("event_id", F.col("value").alias("v"))
    intervals = ev.select(
        F.col("event_id").alias("iv_id"),
        (F.col("value") - 1).alias("start"),
        (F.col("value") + 1).alias("end"),
    )
    plan = (
        interval_join(points, intervals, "v", bucket_width=2.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_null_right_value_not_torn(spark):
    """A legitimate NULL in the matched right row must arrive as NULL —
    not be back-filled from an older right row (whole-row atomicity)."""
    import datetime as dt

    left = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 3))], "user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 1), 5.0),
            ("k", dt.datetime(2024, 1, 1, 2), None),
        ],
        "user_id string, ts timestamp, state double",
    )
    row = asof_join(left, right, on=["user_id"]).first()
    assert row["ts_r"] == dt.datetime(2024, 1, 1, 2)
    assert row["state_r"] is None


def test_asof_join_right_ts_ties_deterministic(spark):
    """Right rows tied on ts resolve to the greatest value tuple,
    identically across partitionings."""
    import datetime as dt

    left = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1, 2))], "user_id string, ts timestamp"
    )
    rows = [
        ("k", dt.datetime(2024, 1, 1, 1), "A"),
        ("k", dt.datetime(2024, 1, 1, 1), "B"),
    ]
    for parts in (1, 4):
        right = spark.createDataFrame(
            rows, "user_id string, ts timestamp, state string"
        ).repartition(parts)
        got = asof_join(left, right, on=["user_id"]).first()["state_r"]
        assert got == "B"


def test_interval_join_multiset_and_null_columns(spark):
    from geoscan_fraud_spark.operators.asof import interval_join

    # two value-identical points and a NULL-bearing point, one interval
    points = spark.createDataFrame(
        [(5.0, "x"), (5.0, "x"), (5.5, None)], "v double, tag string"
    )
    intervals = spark.createDataFrame(
        [(4.0, 6.0, "iv1")], "start double, end double, name string"
    )
    inner = interval_join(points, intervals, "v", bucket_width=1.0)
    # duplicate input points each match once (multiset semantics)
    assert inner.count() == 3
    left = interval_join(points, intervals, "v", bucket_width=1.0, how="left")
    # all matched -> no spurious NULL-interval duplicates for the NULL-tag row
    assert left.count() == 3
    assert left.filter(F.col("name").isNull()).count() == 0


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_tolerance_matches_pandas(spark, sides, direction):
    """tolerance nulls matches farther than the bound — exactly
    pandas.merge_asof(tolerance=...)."""
    left, right = sides
    got = asof_join(
        left,
        right,
        on=["user_id"],
        ts_col="ts",
        direction=direction,
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    gp = _pd(got).sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)

    lp = _pd(left).sort_values("ts")
    rp = _pd(right).sort_values("ts")
    exp = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="user_id",
        direction=direction,
        suffixes=("", "_r"),
        tolerance=pd.Timedelta(minutes=30),
    ).sort_values(["user_id", "ts", "lv"]).reset_index(drop=True)

    assert len(gp) == len(exp)
    assert gp["state_r"].fillna(-1).tolist() == exp["state"].fillna(-1).tolist()
    # the bound actually bit: strictly fewer matches than the unbounded join
    unbounded = asof_join(
        left, right, on=["user_id"], ts_col="ts", direction=direction
    )
    assert (
        got.filter(F.col("state_r").isNotNull()).count()
        < unbounded.filter(F.col("state_r").isNotNull()).count()
    )


def test_asof_join_numeric_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "x"), (1, 100.0, "y")], ["k", "ts", "lv"]
    )
    right = spark.createDataFrame(
        [(1, 8.0, "a"), (1, 50.0, "b")], ["k", "ts", "rv"]
    )
    out = {
        r["lv"]: r["rv_r"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", tolerance=5.0
        ).collect()
    }
    assert out["x"] == "a"      # delta 2 <= 5
    assert out["y"] is None     # nearest earlier is 50, delta 50 > 5


def test_interval_join_auto_width_is_lazy_and_correct(spark, sf_dir):
    """bucket_width=None must neither run a job at build time nor change
    results vs an explicit median width."""
    ev = load_fixture(spark, sf_dir, "events")
    points = ev.filter(F.col("event_id") % 5 == 0).select(
        "user_id", F.col("value").alias("p")
    )
    intervals = ev.filter(F.col("event_id") % 11 == 0).select(
        "user_id",
        (F.col("value") - 2.0).alias("start"),
        (F.col("value") + 3.0).alias("end"),
    )
    from geoscan_fraud_spark.operators.asof import interval_join

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    auto = interval_join(points, intervals, "p", on=["user_id"])
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # plan build triggered no Spark job

    explicit = interval_join(
        points, intervals, "p", on=["user_id"], bucket_width=5.0
    )
    a = sorted(map(tuple, auto.collect()))
    b = sorted(map(tuple, explicit.collect()))
    assert a == b and len(a) > 0
    assert "__w" not in auto.columns
