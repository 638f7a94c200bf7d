"""Fast vectorized predicate paths used inside join kernels.

The full :func:`hecatoncheir_ray.geometry.predicates.relate` arrangement is
exact but per-pair; the hot join predicates (intersects / point-in-polygon /
within) have cheaper sufficient tests implemented here with pure-numpy
broadcasting.  Reference equivalents: GeometryWrapper::intersects /
pipTest (/root/reference/Hecatoncheir/include/containers.h:1070-1072,
1451-1543 via boost::geometry).
"""

from __future__ import annotations

import numpy as np

from .core import GT_BOX, GT_LINESTRING, GT_POINT, GT_POLYGON, box_to_ring, coords_to_pts
from .predicates import (_ON_EPS, points_in_ring, points_on_polyline,
                         predicate, relate, inside_m, covered_by_m)


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segs_intersect_any(A: np.ndarray, B: np.ndarray, eps=_ON_EPS) -> bool:
    """True if ANY segment of A (n,2,2) intersects any of B (m,2,2),
    including touches and collinear overlap.  Fully vectorized (n x m)."""
    n, m = len(A), len(B)
    if n == 0 or m == 0:
        return False
    p1x, p1y = A[:, 0, 0][:, None], A[:, 0, 1][:, None]
    p2x, p2y = A[:, 1, 0][:, None], A[:, 1, 1][:, None]
    q1x, q1y = B[:, 0, 0][None, :], B[:, 0, 1][None, :]
    q2x, q2y = B[:, 1, 0][None, :], B[:, 1, 1][None, :]
    # scaled epsilon per pair
    la = np.hypot(p2x - p1x, p2y - p1y)
    lb = np.hypot(q2x - q1x, q2y - q1y)
    e = eps * np.maximum(np.maximum(la, lb), 1.0)
    d1 = _orient(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = _orient(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = _orient(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = _orient(p1x, p1y, p2x, p2y, q2x, q2y)
    proper = (((d1 > e) & (d2 < -e)) | ((d1 < -e) & (d2 > e))) \
        & (((d3 > e) & (d4 < -e)) | ((d3 < -e) & (d4 > e)))
    if proper.any():
        return True

    def on_seg(dx, px, py, ax, ay, bx, by):
        return ((np.abs(dx) <= e)
                & (px >= np.minimum(ax, bx) - eps)
                & (px <= np.maximum(ax, bx) + eps)
                & (py >= np.minimum(ay, by) - eps)
                & (py <= np.maximum(ay, by) + eps))

    touch = (on_seg(d1, p1x, p1y, q1x, q1y, q2x, q2y)
             | on_seg(d2, p2x, p2y, q1x, q1y, q2x, q2y)
             | on_seg(d3, q1x, q1y, p1x, p1y, p2x, p2y)
             | on_seg(d4, q2x, q2y, p1x, p1y, p2x, p2y))
    return bool(touch.any())


def _as_ring_or_line(gtype: int, coords: np.ndarray):
    """-> (kind, pts, edges). kind 'A' areal ring, 'L' line, 'P' point."""
    if gtype == GT_POINT:
        return "P", coords_to_pts(coords), None
    if gtype == GT_LINESTRING:
        p = coords_to_pts(coords)
        return "L", p, np.stack([p[:-1], p[1:]], axis=1)
    if gtype == GT_BOX:
        r = box_to_ring(coords)
    else:
        r = coords_to_pts(coords)
    e = np.stack([r, np.roll(r, -1, axis=0)], axis=1)
    return "A", r, e


def fast_intersects(gtype_r: int, cr: np.ndarray,
                    gtype_s: int, cs: np.ndarray) -> bool:
    """boost::geometry::intersects semantics (touch counts), fast path."""
    if gtype_r == GT_BOX and gtype_s == GT_BOX:
        # exact interval overlap — the segment kernel's scaled epsilon can
        # swallow a crossing whose overlap region is tiny relative to the
        # longest edge (e.g. two thin slivers crossing near an endpoint)
        return bool(cr[0] <= cs[2] and cs[0] <= cr[2]
                    and cr[1] <= cs[3] and cs[1] <= cr[3])
    kr, pr, er = _as_ring_or_line(gtype_r, cr)
    ks, ps, es = _as_ring_or_line(gtype_s, cs)
    if kr == "P" and ks == "P":
        return bool(np.hypot(*(pr[0] - ps[0])) <= _ON_EPS)
    if kr == "P":
        return _point_hits(pr, ks, ps)
    if ks == "P":
        return _point_hits(ps, kr, pr)
    # vertex-containment quick hits (covers full containment cases)
    if kr == "A" and points_in_ring(ps[:1], pr)[0] >= 0:
        return True
    if ks == "A" and points_in_ring(pr[:1], ps)[0] >= 0:
        return True
    return segs_intersect_any(er, es)


def _point_hits(p: np.ndarray, kind_other: str, pts_other: np.ndarray) -> bool:
    if kind_other == "A":
        return bool(points_in_ring(p[:1], pts_other)[0] >= 0)
    if kind_other == "L":
        return bool(points_on_polyline(p[:1], pts_other)[0])
    return bool(np.hypot(*(p[0] - pts_other[0])) <= _ON_EPS)


def eval_predicate(name: str, gtype_r: int, cr: np.ndarray,
                   gtype_s: int, cs: np.ndarray) -> bool:
    """Named predicate with fast path for intersects/disjoint."""
    if name == "intersects":
        return fast_intersects(gtype_r, cr, gtype_s, cs)
    if name == "disjoint":
        return not fast_intersects(gtype_r, cr, gtype_s, cs)
    if name in ("inside", "covered_by") and gtype_r == GT_POINT:
        m = relate(gtype_r, cr, gtype_s, cs)
        return inside_m(m) if name == "inside" else covered_by_m(m)
    return predicate(name, gtype_r, cr, gtype_s, cs)


def points_in_polygon_batch(px: np.ndarray, py: np.ndarray,
                            gtype_s: int, cs: np.ndarray) -> np.ndarray:
    """Vectorized classification of many points vs one areal geometry.
    Returns int8 (1 in, 0 on, -1 out)."""
    ring = box_to_ring(cs) if gtype_s == GT_BOX else coords_to_pts(cs)
    return points_in_ring(np.stack([px, py], axis=1), ring)
