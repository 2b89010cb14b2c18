"""Great-circle distance as a native Spark column expression.

The reference measures candidate pairs "using a haversine distance"
inside the GEOSCAN algorithm (`01_geofraud_clustering.py:20`). Implemented
here with built-in trig functions only — whole-stage-codegen friendly,
no UDF (SURVEY §2.7 U7).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Distance in meters between two (lat, lng) pairs — pure JVM expr."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lng2 - lng1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m_np(lat1, lng1, lat2, lng2) -> np.ndarray:
    """numpy mirror for pandas-side code (personalized DBSCAN)."""
    lat1, lng1, lat2, lng2 = (
        np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lng1, lat2, lng2)
    )
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lng2 - lng1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))
