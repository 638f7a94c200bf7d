"""Geometry core: types, WKT/WKB codecs, MBR computation.

Data model (mirrors the behavior of the reference's Shape/GeometryWrapper,
/root/reference/Hecatoncheir/include/containers.h:124-1548, re-expressed
columnar for Arrow):

* A geometry is ``(gtype, coords)`` where ``coords`` is a flat float64 array
  ``[x0, y0, x1, y1, ...]``.
* ``GT_POINT``      — 1 vertex.
* ``GT_LINESTRING`` — >=2 vertices, open polyline (if first==last the OGC
  boundary is empty).
* ``GT_POLYGON``    — single outer ring, stored **unclosed** (first vertex not
  repeated).  MULTI* and holes are rejected, as in the reference parser
  (containers.h:313-317, 956-969).
* ``GT_BOX``        — 2 vertices: (minx,miny),(maxx,maxy).

In Arrow tables geometries ride as three columns:
``gtype:int8``, ``coords:list<float64>`` plus the MBR as four float64 columns
``minx,miny,maxx,maxy`` so MBR filtering is pure columnar compute.
"""

from __future__ import annotations

import struct

import numpy as np

GT_POINT = 1
GT_LINESTRING = 2
GT_POLYGON = 3
GT_BOX = 4

GTYPE_NAMES = {GT_POINT: "POINT", GT_LINESTRING: "LINESTRING",
               GT_POLYGON: "POLYGON", GT_BOX: "BOX"}

# reference: include/def.h:38 (EPS used for MBR equality comparisons)
EPS = 1e-08

# WKB geometry type ids (OGC)
_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3


def coords_to_pts(coords: np.ndarray) -> np.ndarray:
    """Flat [x0,y0,...] -> (n,2) float64 view."""
    a = np.asarray(coords, dtype=np.float64)
    return a.reshape(-1, 2)


def pts_to_coords(pts: np.ndarray) -> np.ndarray:
    return np.asarray(pts, dtype=np.float64).reshape(-1)


def mbr_of(gtype: int, coords: np.ndarray) -> tuple[float, float, float, float]:
    """Envelope (minx,miny,maxx,maxy).  Reference: containers.h:1274-1302."""
    p = coords_to_pts(coords)
    return (float(p[:, 0].min()), float(p[:, 1].min()),
            float(p[:, 0].max()), float(p[:, 1].max()))


def ring_closed(pts: np.ndarray) -> np.ndarray:
    """Return the ring with the first vertex appended (closed form)."""
    if len(pts) and (pts[0] == pts[-1]).all():
        return pts
    return np.vstack([pts, pts[:1]])


def ring_open(pts: np.ndarray) -> np.ndarray:
    """Return the ring without the repeated closing vertex."""
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        return pts[:-1]
    return pts


def signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of an (unclosed) ring."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(0.5 * np.sum(x * y2 - x2 * y))


def correct_ring(ring: np.ndarray) -> np.ndarray:
    """Normalize ring: drop closing vertex, force CCW orientation.

    Mirrors the effect of boost::geometry::correct in the reference parse
    (containers.h:1326-1330) — predicates are orientation-independent, this
    just gives a canonical form.
    """
    r = ring_open(np.asarray(ring, dtype=np.float64))
    if signed_area(r) < 0:
        r = r[::-1].copy()
    return r


def box_to_ring(coords: np.ndarray) -> np.ndarray:
    """BOX coords (2 pts) -> CCW 4-vertex unclosed ring."""
    (x0, y0), (x1, y1) = coords_to_pts(coords)
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)


def ring_is_simple(ring: np.ndarray) -> bool:
    """Validity gate mirroring boost::geometry::is_valid for single rings
    (the reference drops invalid WKT rows at parse, containers.h:956-969):
    no self-intersections between non-adjacent edges, no degenerate spikes,
    non-zero area.  Vectorized all-pairs orientation tests."""
    n = len(ring)
    if n < 3 or abs(signed_area(ring)) < 1e-300:
        return False
    a = ring
    b = np.roll(ring, -1, axis=0)
    p1x, p1y = a[:, 0][:, None], a[:, 1][:, None]
    p2x, p2y = b[:, 0][:, None], b[:, 1][:, None]
    q1x, q1y = a[:, 0][None, :], a[:, 1][None, :]
    q2x, q2y = b[:, 0][None, :], b[:, 1][None, :]
    la = np.hypot(p2x - p1x, p2y - p1y)
    lb = np.hypot(q2x - q1x, q2y - q1y)
    e = 1e-12 * np.maximum(np.maximum(la, lb), 1.0)

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    proper = (((d1 > e) & (d2 < -e)) | ((d1 < -e) & (d2 > e))) \
        & (((d3 > e) & (d4 < -e)) | ((d3 < -e) & (d4 > e)))

    def on_seg(d, px, py, ax, ay, bx, by):
        return ((np.abs(d) <= e)
                & (px >= np.minimum(ax, bx) - 1e-12)
                & (px <= np.maximum(ax, bx) + 1e-12)
                & (py >= np.minimum(ay, by) - 1e-12)
                & (py <= np.maximum(ay, by) + 1e-12))

    touch = (on_seg(d1, p1x, p1y, q1x, q1y, q2x, q2y)
             | on_seg(d2, p2x, p2y, q1x, q1y, q2x, q2y)
             | on_seg(d3, q1x, q1y, p1x, p1y, p2x, p2y)
             | on_seg(d4, q2x, q2y, p1x, p1y, p2x, p2y))
    hit = proper | touch
    idx = np.arange(n)
    nonadj = (np.abs(idx[:, None] - idx[None, :]) > 1) \
        & (np.abs(idx[:, None] - idx[None, :]) != n - 1)
    if (hit & nonadj).any():
        return False
    # adjacent spike: consecutive edges fold back collinearly
    v1 = b - a
    v2 = np.roll(v1, -1, axis=0)
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    dot = (v1 * v2).sum(axis=1)
    scale = np.hypot(v1[:, 0], v1[:, 1]) * np.hypot(v2[:, 0], v2[:, 1])
    if ((np.abs(cross) <= 1e-12 * np.maximum(scale, 1.0))
            & (dot < 0)).any():
        return False
    return True


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------

def parse_wkt(text: str) -> tuple[int, np.ndarray] | None:
    """Parse one WKT string -> (gtype, flat coords) or None if unsupported.

    Mirrors the reference's manual WKT walk + validity gate
    (containers.h:305-358, 727-790, 949-1020): single-ring polygons only;
    MULTI*/GEOMETRYCOLLECTION/holes are rejected (return None) rather than
    raising, matching reference behavior of skipping bad rows.
    """
    t = text.strip()
    up = t.upper()
    try:
        if up.startswith("POINT"):
            body = t[t.index("("):].strip()[1:-1]
            x, y = body.replace(",", " ").split()[:2]
            return GT_POINT, np.array([float(x), float(y)])
        if up.startswith("LINESTRING"):
            body = t[t.index("("):].strip()[1:-1]
            pts = _parse_pt_list(body)
            if len(pts) < 2:
                return None
            return GT_LINESTRING, pts_to_coords(pts)
        if up.startswith("POLYGON"):
            inner = t[t.index("("):].strip()
            # strip one level of parens -> ring list
            rings = _split_rings(inner[1:-1])
            if len(rings) != 1:      # holes rejected (containers.h:956-969)
                return None
            pts = _parse_pt_list(rings[0])
            if len(pts) < 4:
                return None
            ring = correct_ring(pts)
            if len(ring) < 3 or not ring_is_simple(ring):
                return None    # validity gate (containers.h:956-969)
            return GT_POLYGON, pts_to_coords(ring)
        if up.startswith("BOX"):
            body = t[t.index("("):].strip()[1:-1]
            pts = _parse_pt_list(body)
            if len(pts) != 2:
                return None
            return GT_BOX, pts_to_coords(pts)
        # MULTI*, GEOMETRYCOLLECTION, etc.
        return None
    except (ValueError, IndexError):
        return None


def _split_rings(body: str) -> list[str]:
    rings, depth, start = [], 0, -1
    for i, c in enumerate(body):
        if c == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                rings.append(body[start:i])
    return rings


def _parse_pt_list(body: str) -> np.ndarray:
    pts = []
    for part in body.split(","):
        xy = part.split()
        if len(xy) < 2:
            continue
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype=np.float64).reshape(-1, 2)


def format_wkt(gtype: int, coords: np.ndarray) -> str:
    p = coords_to_pts(coords)
    if gtype == GT_POINT:
        return f"POINT ({p[0,0]:.10g} {p[0,1]:.10g})"
    body = ", ".join(f"{x:.10g} {y:.10g}" for x, y in p)
    if gtype == GT_LINESTRING:
        return f"LINESTRING ({body})"
    if gtype == GT_POLYGON:
        c = ring_closed(p)
        body = ", ".join(f"{x:.10g} {y:.10g}" for x, y in c)
        return f"POLYGON (({body}))"
    if gtype == GT_BOX:
        return f"BOX ({p[0,0]:.10g} {p[0,1]:.10g}, {p[1,0]:.10g} {p[1,1]:.10g})"
    raise ValueError(f"unknown gtype {gtype}")


# ---------------------------------------------------------------------------
# WKB (little-endian, 2D only)
# ---------------------------------------------------------------------------

def to_wkb(gtype: int, coords: np.ndarray) -> bytes:
    p = coords_to_pts(coords)
    if gtype == GT_POINT:
        return b"\x01" + struct.pack("<I", _WKB_POINT) + p.tobytes()
    if gtype == GT_LINESTRING:
        return (b"\x01" + struct.pack("<II", _WKB_LINESTRING, len(p))
                + p.tobytes())
    if gtype in (GT_POLYGON, GT_BOX):
        ring = box_to_ring(coords) if gtype == GT_BOX else p
        c = ring_closed(ring)
        return (b"\x01" + struct.pack("<III", _WKB_POLYGON, 1, len(c))
                + c.tobytes())
    raise ValueError(f"unknown gtype {gtype}")


def from_wkb(buf: bytes) -> tuple[int, np.ndarray] | None:
    """Parse 2D WKB (either endianness) -> (gtype, flat coords) or None.

    Same skip-don't-raise policy and validity gate as parse_wkt:
    truncated buffers, vertex counts that overrun the buffer, empty or
    degenerate geometries, non-simple rings and MULTI*/nested types all
    return None rather than raising."""
    if len(buf) < 5:
        return None
    bo = "<" if buf[0] == 1 else ">"
    try:
        (wtype,) = struct.unpack_from(bo + "I", buf, 1)
        wtype %= 1000  # tolerate EWKB/Z flags in low digits
        if wtype == _WKB_POINT:
            x, y = struct.unpack_from(bo + "2d", buf, 5)
            return GT_POINT, np.array([x, y])
        if wtype == _WKB_LINESTRING:
            (n,) = struct.unpack_from(bo + "I", buf, 5)
            if n < 2 or 9 + 16 * n > len(buf):
                return None
            a = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=9)
            return GT_LINESTRING, a.astype(np.float64)
        if wtype == _WKB_POLYGON:
            (nrings,) = struct.unpack_from(bo + "I", buf, 5)
            if nrings != 1:
                return None
            (n,) = struct.unpack_from(bo + "I", buf, 9)
            if n < 4 or 13 + 16 * n > len(buf):
                return None
            a = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=13)
            ring = correct_ring(a.astype(np.float64).reshape(-1, 2))
            if len(ring) < 3 or not ring_is_simple(ring):
                return None
            return GT_POLYGON, pts_to_coords(ring)
        return None
    except struct.error:
        return None
