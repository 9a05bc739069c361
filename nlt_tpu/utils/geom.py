"""Geometry helpers (host-side; reference: nlt/util/geom.py:20-35)."""

import numpy as np


def rad2deg(rad):
    return rad / np.pi * 180.0


def deg2rad(deg):
    return deg / 180.0 * np.pi


def get_convex_hull(pts):
    from scipy.spatial import ConvexHull
    return ConvexHull(np.asarray(pts))


def in_hull(hull_pts, query_pts):
    """Whether each query point lies inside the convex hull of `hull_pts`
    (Delaunay-based, as in the reference)."""
    from scipy.spatial import Delaunay
    tri = Delaunay(np.asarray(hull_pts))
    return tri.find_simplex(np.asarray(query_pts)) >= 0


def normalize(v, axis=-1, eps=1e-12):
    v = np.asarray(v, dtype=np.float64)
    n = np.linalg.norm(v, axis=axis, keepdims=True)
    return v / np.maximum(n, eps)
