"""In-memory DBSCAN for per-group (personalized) fits — numpy only.

The reference's personalized mode runs one model per user, "millions of
models trained in parallel" (`01_geofraud_clustering.py:266`); each group is
small enough for a single worker, so the engine runs this kernel inside
`groupBy(user).applyInPandas`. Semantics match the distributed fit:
grid-bucketed candidate pairing, exact haversine distances, core points =
degree >= minPts (degree counts *other* points within epsilon), clusters =
connected core points (the reference removes degree<minPts vertices before
connected components, `01:28` — border points stay unclustered).

Deterministic: points are processed in (lat, lng) sorted order and cluster
ids are ranked by first appearance in that order, so results are invariant
to input row order and partitioning.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from geoscan_fraud_spark.functions.geo import haversine_m_np
from geoscan_fraud_spark.functions.grid import M_PER_DEG


def local_dbscan(
    lat: np.ndarray, lng: np.ndarray, epsilon_m: float, min_pts: int
) -> np.ndarray:
    """Cluster labels per point; -1 = unclustered (noise or border)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = len(lat)
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels

    order = np.lexsort((lng, lat))
    slat, slng = lat[order], lng[order]

    # epsilon-sized planar buckets in the local metric. Longitude degrees
    # shrink with |lat|, so size the lng step with the group's WORST-CASE
    # latitude (cos is smallest at max |lat|) — with a mean-latitude step a
    # wide-latitude group gets buckets narrower than epsilon at its high
    # latitudes and the 1-ring search misses within-epsilon pairs.
    lat0 = float(np.max(np.abs(slat)))
    step_lat = epsilon_m / M_PER_DEG
    step_lng = epsilon_m / (M_PER_DEG * max(math.cos(math.radians(lat0)), 1e-3))
    bi = np.floor(slat / step_lat).astype(np.int64)
    bj = np.floor(slng / step_lng).astype(np.int64)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for idx, (a, b) in enumerate(zip(bi.tolist(), bj.tolist())):
        buckets[(a, b)].append(idx)

    # neighbor search vectorized per bucket: one (bucket x candidates)
    # distance matrix, reduced straight to degrees + an edge array — no
    # per-point neighbor lists, no Python inner loops
    degree = np.zeros(n, dtype=np.int64)
    e_src: list[np.ndarray] = []
    e_dst: list[np.ndarray] = []
    for (a, b), members in buckets.items():
        cand: list[int] = []
        for da in (-1, 0, 1):
            for db in (-1, 0, 1):
                cand.extend(buckets.get((a + da, b + db), ()))
        cand_arr = np.asarray(cand, dtype=np.int64)
        mem_arr = np.asarray(members, dtype=np.int64)
        d = haversine_m_np(
            slat[mem_arr][:, None],
            slng[mem_arr][:, None],
            slat[cand_arr][None, :],
            slng[cand_arr][None, :],
        )
        within = d <= epsilon_m
        # self sits in its own bucket exactly once at distance 0
        degree[mem_arr] = within.sum(axis=1) - 1
        rows, cols = np.nonzero(within)
        src, dst = mem_arr[rows], cand_arr[cols]
        keep = src < dst  # undirected, drop self-pairs
        e_src.append(src[keep])
        e_dst.append(dst[keep])

    core = degree >= min_pts

    # connected components over core-core epsilon edges by min-label
    # propagation + pointer jumping: O(E) numpy work per round, log-depth
    # rounds — replaces a per-edge Python union-find loop
    src = np.concatenate(e_src) if e_src else np.empty(0, dtype=np.int64)
    dst = np.concatenate(e_dst) if e_dst else np.empty(0, dtype=np.int64)
    keep = core[src] & core[dst]
    src, dst = src[keep], dst[keep]

    comp = np.arange(n, dtype=np.int64)
    while True:
        m = np.minimum(comp[src], comp[dst])
        new = comp.copy()
        np.minimum.at(new, src, m)
        np.minimum.at(new, dst, m)
        while True:
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, comp):
            break
        comp = new

    # cluster ids ranked by component root (= min core index), which is
    # first-appearance order in the sorted scan — same determinism as before
    slabels = np.full(n, -1, dtype=np.int64)
    core_idx = np.nonzero(core)[0]
    if len(core_idx):
        roots = comp[core_idx]
        uniq, inv = np.unique(roots, return_inverse=True)
        slabels[core_idx] = inv

    labels[order] = slabels
    return labels
