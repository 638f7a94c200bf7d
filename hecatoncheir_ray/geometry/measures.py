"""Vectorized scalar measures over the columnar geometry table: signed
area (shoelace), perimeter / length, centroid.  Standard spatial-engine
scalar functions (the reference exposes only predicates/distance —
include/containers.h — these round out the §2.8 scalar surface for
pipeline use: density filters, size-based routing, tile budgeting).

Summation order is pinned LEFT-TO-RIGHT over the vertex index so the SQL
twins in ``__ray_entry__`` reproduce results bit-exactly (numpy pairwise
reduction is not used; each term is accumulated explicitly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import GT_BOX, GT_LINESTRING, GT_POINT, GT_POLYGON


def _ragged(offsets: np.ndarray, values: np.ndarray):
    return offsets[:-1], offsets[1:]


def ring_measures_fixed(xs: np.ndarray, ys: np.ndarray):
    """(nv, n) vertex arrays of UNCLOSED rings -> (area, perimeter, cx, cy)
    with left-to-right accumulation over the vertex index (bit-stable)."""
    nv = xs.shape[0]
    s = None          # shoelace sum
    p = None          # perimeter sum
    sx = None         # centroid x numerator
    sy = None
    for i in range(nv):
        j = (i + 1) % nv
        t = xs[i] * ys[j] - xs[j] * ys[i]
        e = np.sqrt((xs[j] - xs[i]) * (xs[j] - xs[i])
                    + (ys[j] - ys[i]) * (ys[j] - ys[i]))
        cxt = (xs[i] + xs[j]) * t
        cyt = (ys[i] + ys[j]) * t
        s = t if s is None else s + t
        p = e if p is None else p + e
        sx = cxt if sx is None else sx + cxt
        sy = cyt if sy is None else sy + cyt
    area = 0.5 * s
    return area, p, sx / (6.0 * area), sy / (6.0 * area)


def geometry_measures(t: pa.Table) -> pa.Table:
    """Geometry table batch -> (id, area, length, cx, cy).

    * polygon: shoelace area (positive for CCW), ring perimeter as
      ``length``, area centroid;
    * box: exact width*height, 2*(w+h), center;
    * linestring: area 0, polyline length, vertex-chain midpoint by
      length-weighted segment midpoints;
    * point: zeros + the point itself.
    """
    gtypes = t["gtype"].to_numpy(zero_copy_only=False)
    coords = t["coords"].combine_chunks() if isinstance(
        t["coords"], pa.ChunkedArray) else t["coords"]
    offs = np.asarray(coords.offsets)
    vals = coords.flatten().to_numpy(zero_copy_only=False)
    n = len(t)
    area = np.zeros(n)
    length = np.zeros(n)
    cx = np.zeros(n)
    cy = np.zeros(n)

    box = gtypes == GT_BOX
    if box.any():
        bi = np.nonzero(box)[0]
        o = offs[bi]
        x0, y0, x1, y1 = vals[o], vals[o + 1], vals[o + 2], vals[o + 3]
        area[bi] = (x1 - x0) * (y1 - y0)
        length[bi] = 2.0 * ((x1 - x0) + (y1 - y0))
        cx[bi] = (x0 + x1) * 0.5
        cy[bi] = (y0 + y1) * 0.5

    pt = gtypes == GT_POINT
    if pt.any():
        pi = np.nonzero(pt)[0]
        cx[pi] = vals[offs[pi]]
        cy[pi] = vals[offs[pi] + 1]

    for gt in (GT_POLYGON, GT_LINESTRING):
        m = gtypes == gt
        if not m.any():
            continue
        idx = np.nonzero(m)[0]
        nvert = ((offs[idx + 1] - offs[idx]) // 2).astype(np.int64)
        # group rows by vertex count -> fixed-shape vectorized kernel
        for nv in np.unique(nvert):
            sel = idx[nvert == nv]
            base = offs[sel]
            gather = base[None, :] + 2 * np.arange(nv)[:, None]
            xs = vals[gather]
            ys = vals[gather + 1]
            if gt == GT_POLYGON:
                a, p, gx, gy = ring_measures_fixed(xs, ys)
                area[sel] = a
                length[sel] = p
                cx[sel] = gx
                cy[sel] = gy
            else:
                seg = np.sqrt((xs[1:] - xs[:-1]) ** 2
                              + (ys[1:] - ys[:-1]) ** 2)
                L = None
                wx = None
                wy = None
                for i in range(int(nv) - 1):
                    mx = (xs[i] + xs[i + 1]) * 0.5 * seg[i]
                    my = (ys[i] + ys[i + 1]) * 0.5 * seg[i]
                    L = seg[i] if L is None else L + seg[i]
                    wx = mx if wx is None else wx + mx
                    wy = my if wy is None else wy + my
                length[sel] = L
                cx[sel] = wx / L
                cy[sel] = wy / L

    return pa.table({"id": t["id"],
                     "area": pa.array(area, type=pa.float64()),
                     "length": pa.array(length, type=pa.float64()),
                     "cx": pa.array(cx, type=pa.float64()),
                     "cy": pa.array(cy, type=pa.float64())})


def measures_dataset(geoms):
    """Dataset-level wrapper: geometry table -> (id, area, length, cx, cy)."""
    return geoms.map_batches(geometry_measures, batch_format="pyarrow")
