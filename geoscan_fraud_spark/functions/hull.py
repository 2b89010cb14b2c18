"""Convex hulls and GeoJSON construction — pure Python/numpy.

The reference's GEOSCAN step 3 wraps each cluster in "the smallest shape
that includes all core geo coordinates" (`01_geofraud_clustering.py:30-32`)
and exports RFC 7946 GeoJSON (`01:139`, `01:143`). No shapely/scipy in this
environment, so the hull is Andrew's monotone chain (O(n log n)), run
per-cluster inside `applyInPandas` groups.
"""

from __future__ import annotations

import json

import numpy as np

#: padding (degrees) applied to degenerate hulls (<3 distinct / collinear
#: points) so every cluster yields a real polygon with area; ~11 m.
DEGENERATE_PAD_DEG = 1e-4


def convex_hull(
    points: list[tuple[float, float]], pad_degenerate: bool = True
) -> list[tuple[float, float]]:
    """Monotone-chain convex hull.

    ``points``: (lng, lat) pairs. Returns CCW hull vertices (unclosed).
    Degenerate inputs (all collinear or <3 distinct) get a small bounding
    box so downstream polygon fill still produces tiles — unless
    ``pad_degenerate=False`` (used by the partial level of the two-level
    hull, where synthetic vertices would leak into the global hull); then
    the distinct input points are returned as-is.
    """
    pts = sorted(set(points))
    if len(pts) >= 3:
        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        lower: list[tuple[float, float]] = []
        for p in pts:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        upper: list[tuple[float, float]] = []
        for p in reversed(pts):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = lower[:-1] + upper[:-1]
        if len(hull) >= 3:
            return hull
    if not pad_degenerate:
        return pts
    # degenerate: pad the bounding box into a quad
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    x0, x1 = min(xs) - DEGENERATE_PAD_DEG, max(xs) + DEGENERATE_PAD_DEG
    y0, y1 = min(ys) - DEGENERATE_PAD_DEG, max(ys) + DEGENERATE_PAD_DEG
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def polygon_geometry(hull_lnglat: list[tuple[float, float]]) -> str:
    """Hull vertices -> GeoJSON Polygon geometry string (ring closed)."""
    ring = [[float(x), float(y)] for x, y in hull_lnglat]
    ring.append(ring[0])
    return json.dumps({"type": "Polygon", "coordinates": [ring]}, separators=(",", ":"))


def feature(cluster_id: int, geometry_json: str, properties: dict | None = None) -> str:
    props = json.dumps(properties or {}, separators=(",", ":"))
    return (
        f'{{"type":"Feature","id":{int(cluster_id)},"properties":{props},'
        f'"geometry":{geometry_json}}}'
    )


def feature_collection(features: list[str]) -> str:
    return '{"type":"FeatureCollection","features":[' + ",".join(features) + "]}"


def geometry_ring(geometry_json: str) -> np.ndarray:
    """GeoJSON Polygon string -> (n, 2) array of (lng, lat) ring vertices
    (closing vertex dropped)."""
    g = json.loads(geometry_json)
    ring = np.asarray(g["coordinates"][0], dtype=np.float64)
    if len(ring) > 1 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    return ring


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting. ``ring``: (n,2) (x, y) vertices.

    Boundary behavior is half-open (standard crossing rule) — adequate for
    cell-center containment tests.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
        if ey1 == ey2:
            continue
        cond = (ey1 > py) != (ey2 > py)
        xint = (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1
        inside ^= cond & (px < xint)
    return inside
