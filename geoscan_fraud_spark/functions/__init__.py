"""Scalar / column-level functions: grid index, haversine, hulls, polyfill."""
