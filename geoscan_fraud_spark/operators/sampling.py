"""Seeded spatial downsampling — the reference's skew mitigation.

Reference `01_geofraud_clustering.py:170-198`: cap points per fine cell
(<=10 per res-11 ~30 m cell) before fitting; "dropped our skew by 80%"
(`01:203`). The reference does collect_list + random.sample in a UDF
(unseeded, and materializes whole groups); the engine uses a windowed
rank over a seeded hash — no group materialization, deterministic, and
the window partitioning key is the (high-cardinality) cell id, so it
scales to 100 TB without hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geoscan_fraud_spark.functions.grid import cell_id


def spatial_downsample(
    df: DataFrame,
    lat_col: str = "latitude",
    lng_col: str = "longitude",
    res: int = 11,
    max_per_cell: int = 10,
    seed: int = 42,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``max_per_cell`` rows per grid cell (per extra key).

    Selection is by seeded-hash rank — stable under row order and
    partitioning, unlike the reference's unseeded `random.sample`
    (SURVEY §5.3 determinism note).
    """
    keys = [cell_id(F.col(lat_col), F.col(lng_col), res)]
    if extra_keys:
        keys = [F.col(k) for k in extra_keys] + keys
    # rank by a hash of the FULL row, not just coordinates: duplicate
    # coordinates would tie and let partition order pick the survivor;
    # hashing every column gives a total order up to fully-identical rows
    # (which are interchangeable)
    rank_col = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    w = Window.partitionBy(*keys).orderBy(rank_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_cell)
        .drop("__rn")
    )
