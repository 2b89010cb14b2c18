"""Polygon -> covering grid cells, with ring relaxation ("layers").

Implements the reference's `getTiles(precision, layers)` semantics: "fill
our polygons with H3 tiles ... allowing tiles to slightly spill over by 1,
2, or X additional layers" (`01_geofraud_clustering.py:360-364`). Runs
per-polygon inside `applyInPandas` groups; all numpy.
"""

from __future__ import annotations

import numpy as np

from geoscan_fraud_spark.functions.grid import step_deg
from geoscan_fraud_spark.functions.hull import geometry_ring, points_in_polygon

#: hard cap on cells emitted per polygon — a malformed/huge polygon at a
#: fine resolution must fail loudly rather than OOM an executor.
MAX_CELLS_PER_POLYGON = 2_000_000


def polyfill(geometry_json: str, res: int, layers: int = 0) -> list[str]:
    """Cells (engine ids) covering the polygon, dilated by ``layers`` rings.

    Fill rule: a cell is covered if its center lies inside the polygon, or
    it contains a polygon vertex (guarantees non-empty output for polygons
    smaller than one cell). Dilation is a square (2*layers+1) structuring
    element — the grid analog of H3's k-ring relaxation.
    """
    ring = geometry_ring(geometry_json)
    s = step_deg(res)
    lats, lngs = ring[:, 1], ring[:, 0]
    i_lo = int(np.floor((lats.min() + 90.0) / s))
    i_hi = int(np.floor((lats.max() + 90.0) / s))
    j_lo = int(np.floor((lngs.min() + 180.0) / s))
    j_hi = int(np.floor((lngs.max() + 180.0) / s))
    n_cells = (i_hi - i_lo + 1) * (j_hi - j_lo + 1)
    if n_cells > MAX_CELLS_PER_POLYGON:
        raise ValueError(
            f"polyfill would touch {n_cells} cells at res {res} "
            f"(cap {MAX_CELLS_PER_POLYGON}); use a coarser resolution"
        )

    ii, jj = np.meshgrid(
        np.arange(i_lo, i_hi + 1, dtype=np.int64),
        np.arange(j_lo, j_hi + 1, dtype=np.int64),
        indexing="ij",
    )
    ii, jj = ii.ravel(), jj.ravel()
    # cell centers
    cy = (ii + 0.5) * s - 90.0
    cx = (jj + 0.5) * s - 180.0
    keep = points_in_polygon(cx, cy, ring)
    filled = set(zip(ii[keep].tolist(), jj[keep].tolist()))
    # vertex cells (polygon smaller than a cell, or sliver corners)
    vi = np.floor((lats + 90.0) / s).astype(np.int64)
    vj = np.floor((lngs + 180.0) / s).astype(np.int64)
    filled.update(zip(vi.tolist(), vj.tolist()))

    if layers > 0:
        # mirror of ring_cells' boundary handling: longitude wraps modulo
        # the cell count (antimeridian adjacency), latitude rows past the
        # poles are dropped — a negative index would format as '-0001…',
        # a malformed id no scan-side cell ever matches
        n_lng = int(np.ceil(360.0 / s))
        i_max = int(np.floor(180.0 / s))
        dilated = set()
        rng = range(-layers, layers + 1)
        for i, j in filled:
            for di in rng:
                if not 0 <= i + di <= i_max:
                    continue
                for dj in rng:
                    dilated.add((i + di, (j + dj) % n_lng))
        filled = dilated
        if len(filled) > MAX_CELLS_PER_POLYGON:
            raise ValueError("polyfill dilation exceeded cell cap")

    prefix = format(res, "02X")
    return [f"{prefix}{i:07X}{j:07X}" for i, j in sorted(filled)]
