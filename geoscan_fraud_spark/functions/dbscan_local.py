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

    # epsilon-sized planar buckets in the local metric
    lat0 = float(np.mean(slat))
    step_lat = epsilon_m / M_PER_DEG
    step_lng = epsilon_m / (M_PER_DEG * max(math.cos(math.radians(lat0)), 1e-3))
    bi = np.floor(slat / step_lat).astype(np.int64)
    bj = np.floor(slng / step_lng).astype(np.int64)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for idx, (a, b) in enumerate(zip(bi.tolist(), bj.tolist())):
        buckets[(a, b)].append(idx)

    # neighbor search vectorized per bucket: one (bucket x candidates)
    # distance matrix instead of a Python loop per point — ~10x faster on
    # the 10k-points-per-user groups the personalized fit sees
    nbrs: list[np.ndarray] = [np.empty(0, dtype=np.int64)] * n
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
        for row, idx in enumerate(mem_arr.tolist()):
            sel = cand_arr[within[row]]
            nbrs[idx] = sel[sel != idx]

    core = np.array([len(nb) >= min_pts for nb in nbrs], dtype=bool)

    # union-find over core points through epsilon edges
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in nbrs[i]:
            if core[j]:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    slabels = np.full(n, -1, dtype=np.int64)
    next_id = 0
    root_to_id: dict[int, int] = {}
    for i in range(n):
        if not core[i]:
            continue
        r = find(i)
        if r not in root_to_id:
            root_to_id[r] = next_id
            next_id += 1
        slabels[i] = root_to_id[r]

    labels[order] = slabels
    return labels
