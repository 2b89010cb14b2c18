"""As-of (point-in-time) join — attach to each left row the single most
recent right row per key, an operator the DataFrame API lacks natively
(SURVEY §2.10 family; the reference's TTL'd "current behavior" lookups,
`02_geofraud_fraud.py:281-287`, are the degenerate whole-window case).

100 TB shape: the naive formulation — range join + per-left-row top-1 —
explodes into a near-cross-product per key before pruning. The
union-window form here never builds that product: tag both sides, union,
and run `last(value, ignorenulls=True)` over one (key, time)-sorted
window. ONE shuffle keyed by the join keys, output linear in
|left| + |right|, and both window functions share the single sort. This
is the standard scalable as-of plan (what dedicated time-series engines
compile to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` (``direction='backward'``; ties inclusive) or
    the smallest ``right.ts >= left.ts`` (``'forward'``) sharing ``on``.
    Left rows with no match keep NULLs (left-outer semantics, like
    ``pandas.merge_asof``).

    Right's non-key, non-ts columns are attached with ``suffix``; the
    matched right timestamp arrives as ``ts<suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = list(on)
    rvals = [c for c in right.columns if c not in keys and c != ts_col]
    lvals = [c for c in left.columns if c not in keys and c != ts_col]

    # The matched right row travels as ONE struct so its fields can never
    # tear: filling each right column with its own last(ignorenulls=True)
    # would substitute an OLDER row's value wherever the matched row holds
    # a legitimate NULL.
    pack_type = T.StructType(
        [T.StructField("__ts", right.schema[ts_col].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in rvals]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.lit(0).alias("__src"),
        F.struct(
            F.col(ts_col).alias("__ts"), *[F.col(c) for c in rvals]
        ).alias("__rpack"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lvals],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.lit(1).alias("__src"),
        F.lit(None).cast(pack_type).alias("__rpack"),
        *[F.col(c).alias(f"__l_{c}") for c in lvals],
    )
    both = r.unionByName(l)

    # Total order: (ts, side, right-value tuple). Right rows sort before
    # left at equal ts (ties inclusive); right rows tied on ts resolve
    # deterministically to the greatest value tuple — pandas' "last
    # occurrence" is input-order-dependent, which a distributed engine
    # cannot reproduce.
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__src").asc(), F.col("__rpack").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = both.select(
        *keys,
        ts_col,
        "__src",
        F.last("__rpack", ignorenulls=True).over(w).alias("__rpack"),
        *[F.col(f"__l_{c}") for c in lvals],
    )
    return filled.filter(F.col("__src") == 1).select(
        *keys,
        ts_col,
        *[F.col(f"__l_{c}").alias(c) for c in lvals],
        *[F.col(f"__rpack.{c}").alias(f"{c}{suffix}") for c in rvals],
        F.col("__rpack.__ts").alias(f"{ts_col}{suffix}"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    on: list[str] | None = None,
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Match each point row to every interval row with
    ``start <= point < end`` (optionally also matching ``on`` keys) —
    the range join Spark's planner would otherwise execute as a
    broadcast-nested-loop / cartesian product.

    Bucket-then-verify (the geo engine's cell join, J4, on a number
    line): intervals explode to the fixed-width buckets they cover,
    points map to their single bucket, the match is a plain equi-join on
    (keys, bucket) followed by the exact range filter. Both sides carry a
    per-row id for the duration of the join, so (a) duplicates from an
    interval spanning several buckets are removed per ROW pair — value-
    identical input rows still produce one match each (multiset
    semantics) — and (b) the ``how='left'`` accounting of unmatched
    points is id-based, immune to the null-unsafe-equality trap of
    anti-joining on value columns. Pick ``bucket_width`` near the median
    interval length: output work is then O(matches), not
    O(|points| x |intervals|). Long intervals only widen their own
    explode (len/width buckets); short ones cost one row.

    ``how='left'`` keeps unmatched points with NULL interval columns.
    Leaving ``bucket_width`` unset runs one small eager aggregate over
    ``intervals`` (median length) before building the plan — pass an
    explicit width in latency-sensitive call sites.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = list(on or [])
    if bucket_width is None:
        q = intervals.select(
            F.expr(f"percentile_approx({end_col} - {start_col}, 0.5)")
        ).first()[0]
        bucket_width = float(q) if q and q > 0 else 1.0
    w = float(bucket_width)

    iv = intervals.withColumn("__iid", F.monotonically_increasing_id()).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__pid", F.monotonically_increasing_id()).withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("long")
    )
    matched = (
        pt.join(iv, keys + ["__bucket"], "inner")
        .filter(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
        .dropDuplicates(["__pid", "__iid"])
    )
    if how == "inner":
        return matched.drop("__pid", "__iid")
    missing = pt.drop("__bucket").join(
        matched.select("__pid"), "__pid", "left_anti"
    )
    for c in matched.columns:
        if c not in pt.columns:
            missing = missing.withColumn(c, F.lit(None).cast(dict(matched.dtypes)[c]))
    return matched.unionByName(missing.select(matched.columns)).drop("__pid", "__iid")
