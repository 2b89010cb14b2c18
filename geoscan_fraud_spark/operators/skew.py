"""Skew-salted equi-join — explicit key salting for hot join keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's sessions) repartitions oversized *partitions*,
which handles moderately skewed keys. What it cannot do is split a
SINGLE hot key whose build side must be replicated — the classic 100 TB
failure where one key holds 1% of a fact table and its sort-merge task
runs for hours. Salting fixes that shape at the plan level: the skewed
(large) side scatters each row into one of ``salt`` sub-keys, the
replicated (small-but-not-broadcastable) side duplicates each row
``salt`` times, and the join runs on (keys + salt) with per-key
parallelism ``salt``. Output is multiset-identical to the plain join —
the property the driver oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    replicated: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed`` with ``replicated`` on ``on`` with the hot
    keys of the skewed side scattered across ``salt`` sub-partitions.

    The salt is DETERMINISTIC — `xxhash64` over every skewed-side column
    plus ``seed`` — so retries, AQE re-plans and oracle replays see the
    same assignment (F.rand would not survive any of those). Rows that
    are fully identical share a salt and stay co-located; if the skew is
    *duplicate rows* rather than a hot key with varied payloads,
    pre-aggregate them into weighted rows first (`exact_dedup_agg`
    pattern) — salting cannot separate indistinguishable rows.

    ``how``: 'inner' or 'left' (left = skewed side preserved; every
    skewed row carries exactly one salt value, so unmatched rows surface
    exactly once, NULL-extended — same as the unsalted left join).
    ``replicated`` is exploded ``salt``× — size its replication factor
    against executor memory; if it fits a broadcast, use `F.broadcast`
    instead, which needs no salt at all.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if _SALT_COL in skewed.columns or _SALT_COL in replicated.columns:
        raise ValueError(f"column name {_SALT_COL!r} is reserved by salted_join")
    s = skewed.withColumn(
        _SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns], F.lit(seed)),
            F.lit(salt),
        ).cast("int"),
    )
    r = replicated.withColumn(
        _SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return s.join(r, on + [_SALT_COL], how).drop(_SALT_COL)
