"""Douglas-Peucker polyline simplification, vectorized ACROSS a batch.

The classic recursive algorithm, restructured as rounds over a global
active-segment worklist so one batch of polylines is processed with
numpy passes only (no per-line or per-segment Python recursion):

    round:  for every active segment (chord between two kept vertices),
            compute all interior-point perpendicular distances in one
            ragged pass (repeat/cumsum indexing + maximum.reduceat),
            keep each segment's first farthest vertex where the max
            exceeds eps, split those segments, retire the rest.

Rounds bound the recursion DEPTH of the scalar algorithm (typically
O(log n)); total work per round stays linear in surviving points.
Guarantee (standard DP): every dropped vertex lies within ``eps`` of
the simplified chain; endpoints are always kept.  Tie-breaking (first
index wins at equal distance) matches the scalar reference exactly, so
results are deterministic and batch-invariant.
"""

from __future__ import annotations

import numpy as np

_BIG = np.int64(np.iinfo(np.int64).max)


def _ragged_interior(starts: np.ndarray, ends: np.ndarray):
    """Global indices of interior points start+1..end-1 per segment plus
    the owning-segment index — the repeat/cumsum ragged-arange trick."""
    counts = ends - starts - 1
    total = int(counts.sum())
    seg_of = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
    base = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=base[1:])
    local = np.arange(total, dtype=np.int64) - np.repeat(base, counts)
    return np.repeat(starts + 1, counts) + local, seg_of, counts


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray,
                 offs: np.ndarray, eps: float,
                 row_mask: np.ndarray | None = None) -> np.ndarray:
    """Per-vertex keep mask for Douglas-Peucker over a BATCH of
    polylines: vertices of line i are ``offs[i]:offs[i+1]`` in xs/ys.

    ``row_mask`` restricts simplification to the flagged rows; vertices
    of unflagged rows are all kept and never enter the worklist (no
    wasted distance passes over pass-through geometries)."""
    nv = len(xs)
    keep = np.zeros(nv, dtype=bool)
    starts = offs[:-1].astype(np.int64)
    ends = (offs[1:] - 1).astype(np.int64)
    if row_mask is None:
        row_mask = np.ones(len(starts), dtype=bool)
    keep |= np.repeat(~row_mask, (offs[1:] - offs[:-1]).astype(np.int64))
    ok = row_mask & (ends >= starts)       # non-empty active lines
    keep[starts[ok]] = True
    keep[ends[ok]] = True
    seg_mask = row_mask & (ends > starts)
    seg_s = starts[seg_mask]
    seg_e = ends[seg_mask]
    while len(seg_s):
        live = seg_e > seg_s + 1
        seg_s, seg_e = seg_s[live], seg_e[live]
        if not len(seg_s):
            break
        pidx, seg_of, counts = _ragged_interior(seg_s, seg_e)
        sx, sy = xs[seg_s], ys[seg_s]
        dx, dy = xs[seg_e] - sx, ys[seg_e] - sy
        norm = np.hypot(dx, dy)
        px = xs[pidx] - sx[seg_of]
        py = ys[pidx] - sy[seg_of]
        # perpendicular distance to the chord; for a degenerate chord
        # (coincident endpoints) fall back to point distance
        cross = np.abs(dx[seg_of] * py - dy[seg_of] * px)
        dist = np.where(norm[seg_of] > 0.0,
                        cross / np.where(norm[seg_of] == 0.0, 1.0,
                                         norm[seg_of]),
                        np.hypot(px, py))
        bounds = np.zeros(len(seg_s), dtype=np.int64)
        np.cumsum(counts[:-1], out=bounds[1:])
        seg_max = np.maximum.reduceat(dist, bounds)
        split = seg_max > eps
        if not split.any():
            break
        # first interior index attaining the segment max (ties: lowest)
        at_max = dist == seg_max[seg_of]
        cand = np.where(at_max, pidx, _BIG)
        far = np.minimum.reduceat(cand, bounds)[split]
        keep[far] = True
        seg_s = np.concatenate([seg_s[split], far])
        seg_e = np.concatenate([far, seg_e[split]])
    return keep


def ring_keep_mask(xs: np.ndarray, ys: np.ndarray,
                   offs: np.ndarray, eps: float,
                   row_mask: np.ndarray | None = None) -> np.ndarray:
    """Douglas-Peucker for CLOSED rings (unclosed storage), batched.

    The textbook closed-curve reduction: anchor each ring at v0 and at
    the vertex farthest from v0, split into the two boundary chains,
    and run the batch polyline DP over all chains at once.  A ring
    whose interior collapses entirely (polygon within eps of the
    anchor chord) keeps its farthest-from-chord vertex as a third
    anchor so the output stays a valid ring (>= 3 vertices)."""
    nvert = len(xs)
    starts = offs[:-1].astype(np.int64)
    counts = (offs[1:] - offs[:-1]).astype(np.int64)
    if row_mask is None:
        row_mask = np.ones(len(starts), dtype=bool)
    keep = np.zeros(nvert, dtype=bool)
    keep |= np.repeat(~row_mask, counts)
    act = row_mask & (counts >= 1)
    small = act & (counts <= 3)       # triangles and below: keep as-is
    keep |= np.repeat(small, counts)
    big = act & (counts > 3)
    if not big.any():
        return keep
    bs, bc = starts[big], counts[big]
    # farthest vertex from v0 per ring (squared distance; first max)
    pidx, seg_of, _ = _ragged_interior(bs - 1, bs + bc)   # bs..bs+bc-1
    d2 = ((xs[pidx] - xs[bs][seg_of]) ** 2
          + (ys[pidx] - ys[bs][seg_of]) ** 2)
    bounds = np.zeros(len(bs), dtype=np.int64)
    np.cumsum(bc[:-1], out=bounds[1:])
    dmax = np.maximum.reduceat(d2, bounds)
    at = d2 == dmax[seg_of]
    far = np.minimum.reduceat(np.where(at, pidx, _BIG), bounds)
    far = np.maximum(far, bs + 1)      # degenerate all-equal ring: v1
    m = far - bs                       # local index of the far anchor
    # chains: A = v0..vfar (m+1 verts), B = vfar..v_{c-1}, v0 (c-m+1)
    lenA, lenB = m + 1, bc - m + 1
    lens = np.stack([lenA, lenB], axis=1).ravel()     # A, B interleaved
    coffs = np.zeros(2 * len(bs) + 1, dtype=np.int64)
    np.cumsum(lens, out=coffs[1:])
    # ragged locals 0..len-1 per chain via the interior helper with a
    # virtual [-1, len] window
    minus1 = np.full(2 * len(bs), -1, dtype=np.int64)
    ridx, ch_of, _ = _ragged_interior(minus1, lens)
    ring_of = ch_of // 2
    isB = (ch_of % 2) == 1
    base = np.where(isB, far[ring_of], bs[ring_of])
    src = base + ridx
    # chain B's final vertex wraps back to v0
    wrap = isB & (ridx == lenB[ring_of] - 1)
    src[wrap] = bs[ring_of[wrap]]
    k2 = dp_keep_mask(xs[src], ys[src], coffs, eps)
    np.logical_or.at(keep, src, k2)
    # min-3 guarantee: a fully-collapsed ring keeps only v0 + vfar
    nk = np.add.reduceat(keep[pidx].astype(np.int64), bounds)
    collapsed = nk < 3
    if collapsed.any():
        # farthest interior vertex from the (v0, vfar) chord, per ring
        cb = np.flatnonzero(collapsed)
        for i in cb.tolist():        # collapsed rings are rare
            a, c = int(bs[i]), int(bc[i])
            f = int(far[i])
            cand = [j for j in range(a, a + c) if j != a and j != f]
            dx, dy = xs[f] - xs[a], ys[f] - ys[a]
            norm = np.hypot(dx, dy)
            dd = [abs(dx * (ys[j] - ys[a]) - dy * (xs[j] - xs[a]))
                  / norm if norm > 0
                  else np.hypot(xs[j] - xs[a], ys[j] - ys[a])
                  for j in cand]
            keep[cand[int(np.argmax(dd))]] = True
    return keep


def simplify_lines(geoms, eps: float):
    """Dataset stage: geometry table -> same table with every
    LINESTRING's coords Douglas-Peucker-simplified (other geometry
    types pass through untouched); MBRs recomputed from the surviving
    vertices.  One zero-shuffle map_batches."""
    import pyarrow as pa

    from ..stages.assign import geoms_from_table
    from .core import GT_LINESTRING

    def simp(t: pa.Table) -> pa.Table:
        ids, gt, offs, vals, *_ = geoms_from_table(t)
        offs = offs.astype(np.int64)
        if len(ids) == 0:
            return t
        xs, ys = vals[0::2], vals[1::2]
        voffs = offs // 2
        nv = voffs[1:] - voffs[:-1]
        keep = dp_keep_mask(xs, ys, voffs, eps,
                            row_mask=gt == GT_LINESTRING)
        return _rebuild_table(t, ids, xs, ys, voffs, nv, keep)

    return geoms.map_batches(simp, batch_format="pyarrow")


def simplify_polygons(geoms, eps: float):
    """Dataset stage: geometry table -> same table with every POLYGON's
    ring Douglas-Peucker-simplified (closed-curve two-chain anchoring,
    >= 3 vertices guaranteed); other geometry types pass through."""
    import pyarrow as pa

    from ..stages.assign import geoms_from_table
    from .core import GT_POLYGON

    def simp(t: pa.Table) -> pa.Table:
        ids, gt, offs, vals, *_ = geoms_from_table(t)
        offs = offs.astype(np.int64)
        if len(ids) == 0:
            return t
        xs, ys = vals[0::2], vals[1::2]
        voffs = offs // 2
        nv = voffs[1:] - voffs[:-1]
        keep = ring_keep_mask(xs, ys, voffs, eps,
                              row_mask=gt == GT_POLYGON)
        return _rebuild_table(t, ids, xs, ys, voffs, nv, keep)

    return geoms.map_batches(simp, batch_format="pyarrow")


def _rebuild_table(t, ids, xs, ys, voffs, nv, keep):
    """Geometry table with only the kept vertices; MBRs recomputed."""
    import pyarrow as pa
    kx, ky = xs[keep], ys[keep]
    # reduceat over non-empty rows only (an index == len(keep),
    # from a trailing zero-vertex row, would raise); empty rows
    # occupy zero width so skipping their indices changes nothing
    new_nv = np.zeros(len(ids), dtype=np.int64)
    nz = nv > 0
    if nz.any():
        new_nv[nz] = np.add.reduceat(keep.astype(np.int64),
                                     voffs[:-1][nz])
    new_offs = np.concatenate([[0], np.cumsum(new_nv)])
    flat = np.empty(2 * len(kx))
    flat[0::2], flat[1::2] = kx, ky
    coords = pa.ListArray.from_arrays(
        pa.array((2 * new_offs).astype(np.int32)),
        pa.array(flat, type=pa.float64()))
    # per-row MBR over surviving vertices
    mb = new_offs[:-1].copy()
    has = new_nv > 0
    minx = np.zeros(len(ids))
    miny = np.zeros(len(ids))
    maxx = np.zeros(len(ids))
    maxy = np.zeros(len(ids))
    if has.any():
        minx[has] = np.minimum.reduceat(kx, mb[has])
        miny[has] = np.minimum.reduceat(ky, mb[has])
        maxx[has] = np.maximum.reduceat(kx, mb[has])
        maxy[has] = np.maximum.reduceat(ky, mb[has])
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "gtype": t["gtype"],
        "coords": coords,
        "minx": pa.array(minx), "miny": pa.array(miny),
        "maxx": pa.array(maxx), "maxy": pa.array(maxy)})
