"""Hypothesis property tests for the pure-Python kernels — no Spark session
needed, so these fuzz broadly and fast (SURVEY §5.2.3)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoscan_fraud_spark.functions.dbscan_local import local_dbscan
from geoscan_fraud_spark.functions.geo import haversine_m_np
from geoscan_fraud_spark.functions.grid import (
    RES_EDGE_M,
    cell_center_py,
    cell_id_np,
    cell_id_py,
    step_deg,
)
from geoscan_fraud_spark.functions.hull import (
    convex_hull,
    geometry_ring,
    points_in_polygon,
    polygon_geometry,
)
from geoscan_fraud_spark.operators.bloom import BloomFilter

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lng_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
res_st = st.integers(min_value=0, max_value=15)


@given(lat_st, lng_st, res_st)
@settings(max_examples=200)
def test_cell_id_contains_its_point(lat, lng, res):
    cell = cell_id_py(lat, lng, res)
    clat, clng = cell_center_py(cell)
    s = step_deg(res)
    assert abs(clat - lat) <= s
    assert abs(clng - lng) <= s
    # numpy mirror bit-identical
    assert cell_id_np(np.array([lat]), np.array([lng]), res)[0] == cell


@given(lat_st, lng_st, res_st)
@settings(max_examples=100)
def test_cell_id_format(lat, lng, res):
    cell = cell_id_py(lat, lng, res)
    assert len(cell) == 16
    assert cell == cell.upper()
    assert int(cell[:2], 16) == res


@given(st.lists(st.tuples(lng_st, lat_st), min_size=1, max_size=60))
@settings(max_examples=200)
def test_hull_contains_all_points(pts):
    """Convexity containment via signed half-plane distances (ray casting
    is the wrong tool for boundary points — vertices sit ON edges)."""
    hull = convex_hull(pts)
    assert len(hull) >= 3
    ring = geometry_ring(polygon_geometry(hull))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    scale = max(1.0, np.abs(ring).max())
    tol = 1e-9 * scale * scale
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        # CCW ring: every point lies on the left of (or on) each edge
        cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
        assert (cross >= -tol).all(), (i, cross.min())


@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=200, unique=True))
@settings(max_examples=50)
def test_bloom_never_false_negative(items):
    bf = BloomFilter(len(items), 0.01)
    bf.update(items)
    assert all(i in bf for i in items)
    raw = bf.to_bytes()
    bf2 = BloomFilter.from_bytes(raw)
    assert all(i in bf2 for i in items)


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=40.70, max_value=40.71, allow_nan=False),
            st.floats(min_value=-74.01, max_value=-74.00, allow_nan=False),
        ),
        min_size=0,
        max_size=120,
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=50, deadline=None)
def test_dbscan_core_degree_invariant(pts, min_pts):
    if not pts:
        assert len(local_dbscan(np.array([]), np.array([]), 100.0, min_pts)) == 0
        return
    lat = np.array([p[0] for p in pts])
    lng = np.array([p[1] for p in pts])
    labels = local_dbscan(lat, lng, 100.0, min_pts)
    for i in np.where(labels >= 0)[0]:
        d = haversine_m_np(lat[i], lng[i], lat, lng)
        degree = int((d <= 100.0).sum()) - 1
        assert degree >= min_pts
    # order invariance
    order = np.argsort(lng, kind="stable")
    labels2 = local_dbscan(lat[order], lng[order], 100.0, min_pts)
    a = [tuple(sorted(np.where(labels == c)[0])) for c in sorted(set(labels[labels >= 0]))]
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    b = [
        tuple(sorted(order[np.where(labels2 == c)[0]]))
        for c in sorted(set(labels2[labels2 >= 0]))
    ]
    assert sorted(a) == sorted(b)


@given(lat_st, lng_st, lat_st, lng_st)
@settings(max_examples=200)
def test_haversine_metric_properties(lat1, lng1, lat2, lng2):
    d = float(haversine_m_np(lat1, lng1, lat2, lng2))
    assert d >= 0
    assert d <= math.pi * 6371000.0 + 1
    d_sym = float(haversine_m_np(lat2, lng2, lat1, lng1))
    assert abs(d - d_sym) < 1e-6
    assert float(haversine_m_np(lat1, lng1, lat1, lng1)) < 1e-6


def test_resolution_ladder_monotone():
    edges = [RES_EDGE_M[r] for r in sorted(RES_EDGE_M)]
    assert edges == sorted(edges, reverse=True)


# ---------------------------------------------------------------------------
# BPE encode vs training-state (pure python — fuzz broadly)
# ---------------------------------------------------------------------------

word_st = st.text(alphabet="abcdef", min_size=1, max_size=8)


@given(
    st.dictionaries(word_st, st.integers(min_value=1, max_value=9), min_size=1, max_size=12),
    st.integers(min_value=0, max_value=15),
)
@settings(max_examples=150, deadline=None)
def test_bpe_encode_reproduces_training_segmentation(word_weights, num_merges):
    """For ANY corpus and merge budget: rank-priority encoding with the
    learned merge list reproduces each training word's final training
    segmentation (the invariant that makes offline-trained merges safe
    to apply at scoring time)."""
    from geoscan_fraud_spark.operators.bpe import END, _encode_word
    from tests.test_bpe_normalize import _ref_train

    merges = _ref_train(word_weights, num_merges, min_freq=1)
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    # final training segmentation: apply merges in order, leftmost-first
    for w in word_weights:
        syms = list(w) + [END]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert _encode_word(w, ranks) == syms
