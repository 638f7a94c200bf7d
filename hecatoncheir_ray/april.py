"""APRIL raster-interval approximation: generation + interval-join filters.

Reference: /root/reference/Hecatoncheir/src/APRIL/generate.cpp (rasterizer),
src/APRIL/join.cpp (interval joins), src/APRIL/filter.cpp (dispatch).
AprilData = two sorted uint64 interval lists over a Hilbert-ordered 2^N x 2^N
(the reference stores uint32, which overflows at order 16 where an interval
ending at cell 2^32-1 needs end = 2^32; uint64 keeps [start,end) exact)
raster (containers.h:33-96): A-list (ALL cells the geometry touches, stored
as flat [start,end) pairs) and F-list (FULL cells, polygon-interior only).

Generation here mirrors the reference's structure:
* coordinates map into raster space by (cellsPerDim-1)/extent
  (generate.cpp:31-57), window = MBR cells +-1 (generate.cpp:113-120);
* boundary cells come from an exact grid-crossing edge walk (the reference
  uses an Amanatides-Woo traversal, generate.cpp:129-253 — same cell set);
* gaps between boundary cells along the Hilbert curve are homogeneous
  (the curve is 4-adjacent, so a gap cannot cross the boundary) and are
  classified FULL/EMPTY by one representative point-in-polygon test
  (generate.cpp:292-364), here batched over all gaps at once;
* ALL intervals = boundary runs merged through FULL gaps, FULL intervals =
  the full gaps (generate.cpp:268-360).

Filter semantics per predicate follow join.cpp, EXCEPT two reference bugs we
do not reproduce (they would change query results vs the filter-off path):
* insideCoveredByJoinAPRIL (join.cpp:303-320) tests ALL_r vs FULL_s for its
  TRUE_NEGATIVE (comment says ALL-ALL) — unsound: R touching S's partial
  zone is wrongly dropped.  We use ALL_r ⊆ ALL_s for the negative.
* equalJoinAPRIL (join.cpp:347-366) returns TRUE_NEGATIVE when the FULL
  lists *intersect* — which fires for identical polygons.  We only conclude
  TRUE_NEGATIVE when the ALL lists do not match.
With these fixes every filter decision is sound, so filter-on == filter-off
== oracle (the stage-equivalence property of SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np

from .geometry.core import GT_BOX, GT_LINESTRING, GT_POINT, GT_POLYGON, box_to_ring
from .geometry.hilbert import d2xy, xy2d
from .geometry.predicates import (MBR_EQUAL, MBR_INTERSECT, MBR_R_IN_S,
                                  MBR_S_IN_R, TR_CONTAINS, TR_DISJOINT,
                                  TR_INSIDE, TR_INTERSECT, points_in_ring)

TRUE_HIT = 1
INCONCLUSIVE = 0
TRUE_NEGATIVE = -1


# ---------------------------------------------------------------------------
# rasterization
# ---------------------------------------------------------------------------

def _scale(pts: np.ndarray, bounds, cells_per_dim: int) -> np.ndarray:
    """Map coords into raster space (generate.cpp:31-57)."""
    x0, y0, x1, y1 = bounds
    out = np.empty_like(pts)
    out[:, 0] = (cells_per_dim - 1) / (x1 - x0) * (pts[:, 0] - x0)
    out[:, 1] = (cells_per_dim - 1) / (y1 - y0) * (pts[:, 1] - y0)
    np.clip(out, 0, cells_per_dim - 1, out=out)
    return out


def _edge_cells(p: np.ndarray, closed: bool, cells_per_dim: int) -> np.ndarray:
    """All cells touched by the path's edges (exact supercover via grid-line
    crossings; same cell set as the reference's ray traversal)."""
    if len(p) == 1:
        return np.array([[int(p[0, 0]), int(p[0, 1])]], dtype=np.int64)
    a = p
    b = np.roll(p, -1, axis=0) if closed else None
    edges = zip(a, np.roll(a, -1, axis=0)) if closed else zip(a[:-1], a[1:])
    out = []
    for (x1, y1), (x2, y2) in edges:
        ts = [np.array([0.0, 1.0])]
        dx = x2 - x1
        dy = y2 - y1
        if dx != 0:
            lo, hi = (x1, x2) if x1 < x2 else (x2, x1)
            gx = np.arange(np.ceil(lo), np.floor(hi) + 1)
            ts.append((gx - x1) / dx)
        if dy != 0:
            lo, hi = (y1, y2) if y1 < y2 else (y2, y1)
            gy = np.arange(np.ceil(lo), np.floor(hi) + 1)
            ts.append((gy - y1) / dy)
        t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
        tm = (t[:-1] + t[1:]) / 2.0
        tm = tm[(t[1:] - t[:-1]) > 1e-12]
        if len(tm) == 0:
            tm = np.array([0.5])
        cx = np.floor(x1 + tm * dx).astype(np.int64)
        cy = np.floor(y1 + tm * dy).astype(np.int64)
        # include endpoints' own cells
        cx = np.concatenate([cx, [int(x1), int(x2)]])
        cy = np.concatenate([cy, [int(y1), int(y2)]])
        out.append(np.stack([cx, cy], axis=1))
    cells = np.concatenate(out)
    np.clip(cells, 0, cells_per_dim - 1, out=cells)
    return cells


def rasterize_geometry(gtype: int, coords: np.ndarray, bounds,
                       order: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (all_intervals, full_intervals) flat uint64 [s,e) pairs."""
    cells_per_dim = 1 << order
    if gtype == GT_BOX:
        p = box_to_ring(coords)
        region = True
    else:
        p = coords.reshape(-1, 2)
        region = gtype == GT_POLYGON
    # raster-space clipping (mapXYToHilbert clips, generate.cpp:42-57) would
    # distort geometries exceeding the dataspace and make filter decisions
    # unsound -> emit the "no APRIL" sentinel (empty lists, always
    # INCONCLUSIVE downstream) instead
    x0, y0, x1, y1 = bounds
    if (p[:, 0].min() < x0 or p[:, 1].min() < y0
            or p[:, 0].max() > x1 or p[:, 1].max() > y1):
        return (np.zeros(0, np.uint64),) * 2
    sp = _scale(p, bounds, cells_per_dim)
    closed = gtype in (GT_POLYGON, GT_BOX)
    cells = _edge_cells(sp, closed, cells_per_dim)
    key = cells[:, 1] * cells_per_dim + cells[:, 0]
    key = np.unique(key)
    cx = key % cells_per_dim
    cy = key // cells_per_dim
    ids = np.sort(xy2d(order, cx, cy))
    if len(ids) == 0:
        return (np.zeros(0, np.uint64),) * 2
    gaps = np.nonzero(np.diff(ids) > 1)[0]       # gap between ids[i], ids[i+1]
    if region and len(gaps):
        gx, gy = d2xy(order, ids[gaps] + 1)
        reps = np.stack([gx + 0.5, gy + 0.5], axis=1)
        full_gap = points_in_ring(reps, sp) == 1
    else:
        full_gap = np.zeros(len(gaps), dtype=bool)
    # ALL intervals: break only at EMPTY gaps
    empty_idx = gaps[~full_gap]
    starts = np.concatenate([[ids[0]], ids[empty_idx + 1]])
    ends = np.concatenate([ids[empty_idx] + 1, [ids[-1] + 1]])
    all_iv = np.empty(2 * len(starts), dtype=np.uint64)
    all_iv[0::2] = starts
    all_iv[1::2] = ends
    # FULL intervals: the full gaps
    fg = gaps[full_gap]
    full_iv = np.empty(2 * len(fg), dtype=np.uint64)
    full_iv[0::2] = ids[fg] + 1
    full_iv[1::2] = ids[fg + 1]
    return all_iv, full_iv


# ---------------------------------------------------------------------------
# batched rasterization (VERDICT r1 item 7: no per-geometry/per-edge Python)
# ---------------------------------------------------------------------------

def _ragged_starts(counts: np.ndarray) -> np.ndarray:
    s = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=s[1:])
    return s


def _ring_layout(gtypes, offs, vals):
    """(offs, vals) with GT_BOX rows expanded to 4-vertex rings so every
    geometry is a flat vertex list (points:1, lines:n, rings:n)."""
    nv = ((offs[1:] - offs[:-1]) // 2).astype(np.int64)
    is_box = gtypes == GT_BOX
    if not is_box.any():
        return offs.astype(np.int64), vals, nv
    nv2 = np.where(is_box, 4, nv)
    offs2 = np.zeros(len(nv2) + 1, dtype=np.int64)
    np.cumsum(2 * nv2, out=offs2[1:])
    vals2 = np.empty(offs2[-1], dtype=np.float64)
    # copy non-box coords ragged (vectorized old->new index map)
    offs = offs.astype(np.int64)
    row_of_coord = np.repeat(np.arange(len(gtypes), dtype=np.int64),
                             offs[1:] - offs[:-1])
    m = ~is_box[row_of_coord]
    take = np.nonzero(m)[0]
    r = row_of_coord[take]
    vals2[offs2[r] + (take - offs[r])] = vals[take]
    bi = np.nonzero(is_box)[0]
    bx0 = vals[offs[bi]]
    by0 = vals[offs[bi] + 1]
    bx1 = vals[offs[bi] + 2]
    by1 = vals[offs[bi] + 3]
    base = offs2[bi]
    ring = np.stack([bx0, by0, bx1, by0, bx1, by1, bx0, by1], axis=1)
    vals2[(base[:, None] + np.arange(8)[None, :]).ravel()] = ring.ravel()
    return offs2, vals2, nv2


def rasterize_batch(gtypes: np.ndarray, offs: np.ndarray, vals: np.ndarray,
                    bounds, order: int):
    """Vectorized APRIL generation for a whole batch of geometries.

    Same cell sets / interval lists as :func:`rasterize_geometry` run per
    row (equivalence-tested), but every step — grid-crossing enumeration,
    Hilbert mapping, gap classification (one padded-ring PiP pass over all
    gaps of all polygons), interval assembly — runs once over flat arrays.

    Returns (all_values, all_offsets, full_values, full_offsets): flat
    uint64 interval arrays + int32 row offsets ready for
    ``pa.ListArray.from_arrays`` (no per-row Python lists).
    """
    n = len(gtypes)
    cpd = 1 << order
    x0, y0, x1, y1 = bounds
    empty = np.zeros(0, dtype=np.uint64)
    if n == 0:
        z = np.zeros(1, dtype=np.int32)
        return empty, z, empty, z
    offs2, vals2, nv = _ring_layout(np.asarray(gtypes),
                                    np.asarray(offs), np.asarray(vals))
    gx = vals2[0::2]
    gy = vals2[1::2]
    voff = offs2 // 2                      # vertex offsets
    # per-geometry bounds check (sentinel: out-of-dataspace -> empty lists)
    gmin_x = np.minimum.reduceat(gx, voff[:-1])
    gmax_x = np.maximum.reduceat(gx, voff[:-1])
    gmin_y = np.minimum.reduceat(gy, voff[:-1])
    gmax_y = np.maximum.reduceat(gy, voff[:-1])
    ok = ((gmin_x >= x0) & (gmin_y >= y0)
          & (gmax_x <= x1) & (gmax_y <= y1))
    # scale all coords into raster space (generate.cpp:31-57)
    fx = (cpd - 1) / (x1 - x0)
    fy = (cpd - 1) / (y1 - y0)
    sx = np.clip(fx * (gx - x0), 0, cpd - 1)
    sy = np.clip(fy * (gy - y0), 0, cpd - 1)

    # --- vertex cells (covers points and all edge endpoints) ---
    vgeom = np.repeat(np.arange(n, dtype=np.int64), nv)
    vsel = ok[vgeom]
    cell_rows = [np.stack([vgeom[vsel],
                           np.floor(sx[vsel]).astype(np.int64),
                           np.floor(sy[vsel]).astype(np.int64)], axis=1)]

    # --- edge crossing cells ---
    closed = (np.asarray(gtypes) == GT_POLYGON) | \
             (np.asarray(gtypes) == GT_BOX)
    ne = np.where(ok, np.where(closed, np.where(nv > 1, nv, 0),
                               np.maximum(nv - 1, 0)), 0)
    E = int(ne.sum())
    if E:
        egeom = np.repeat(np.arange(n, dtype=np.int64), ne)
        elocal = np.arange(E, dtype=np.int64) \
            - np.repeat(_ragged_starts(ne), ne)
        a = voff[egeom] + elocal
        nxt = (elocal + 1) % nv[egeom]     # wrap only for closed rings
        b = voff[egeom] + nxt
        ex1, ey1 = sx[a], sy[a]
        ex2, ey2 = sx[b], sy[b]
        dx = ex2 - ex1
        dy = ey2 - ey1
        lox = np.minimum(ex1, ex2)
        hix = np.maximum(ex1, ex2)
        loy = np.minimum(ey1, ey2)
        hiy = np.maximum(ey1, ey2)
        cgx = np.ceil(lox)
        cgy = np.ceil(loy)
        kx = np.where(dx != 0,
                      np.maximum(np.floor(hix) - cgx + 1, 0), 0) \
            .astype(np.int64)
        ky = np.where(dy != 0,
                      np.maximum(np.floor(hiy) - cgy + 1, 0), 0) \
            .astype(np.int64)
        counts = kx + ky + 2
        estart = _ragged_starts(counts)
        T = int(counts.sum())
        tv = np.empty(T, dtype=np.float64)
        edge_of_t = np.repeat(np.arange(E, dtype=np.int64), counts)
        tv[estart] = 0.0
        tv[estart + 1] = 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            if kx.sum():
                repx = np.repeat(np.arange(E, dtype=np.int64), kx)
                locx = np.arange(int(kx.sum()), dtype=np.int64) \
                    - np.repeat(_ragged_starts(kx), kx)
                tv[estart[repx] + 2 + locx] = \
                    (cgx[repx] + locx - ex1[repx]) / dx[repx]
            if ky.sum():
                repy = np.repeat(np.arange(E, dtype=np.int64), ky)
                locy = np.arange(int(ky.sum()), dtype=np.int64) \
                    - np.repeat(_ragged_starts(ky), ky)
                tv[estart[repy] + 2 + kx[repy] + locy] = \
                    (cgy[repy] + locy - ey1[repy]) / dy[repy]
        np.clip(tv, 0.0, 1.0, out=tv)
        srt = np.lexsort((tv, edge_of_t))
        tv = tv[srt]
        edge_of_t = edge_of_t[srt]
        same = edge_of_t[1:] == edge_of_t[:-1]
        dt = tv[1:] - tv[:-1]
        mid_mask = same & (dt > 1e-12)
        mi = np.nonzero(mid_mask)[0]
        tm = (tv[mi] + tv[mi + 1]) / 2.0
        me = edge_of_t[mi]
        mcx = np.floor(ex1[me] + tm * dx[me]).astype(np.int64)
        mcy = np.floor(ey1[me] + tm * dy[me]).astype(np.int64)
        cell_rows.append(np.stack([egeom[me], mcx, mcy], axis=1))

    cells = np.concatenate(cell_rows)
    if len(cells) == 0:
        z = np.zeros(n + 1, dtype=np.int32)
        return empty, z, empty.copy(), z.copy()
    np.clip(cells[:, 1:], 0, cpd - 1, out=cells[:, 1:])
    # unique (geom, cell) -> sorted (geom, hilbert d)
    rawkey = cells[:, 0] * (cpd * cpd) + cells[:, 2] * cpd + cells[:, 1]
    rawkey = np.unique(rawkey)
    kg = rawkey // (cpd * cpd)
    kc = rawkey % (cpd * cpd)
    d = xy2d(order, kc % cpd, kc // cpd)
    hkey = kg * np.int64(cpd) * cpd + d    # geoms*2^(2*order) fits: see doc
    hkey = np.sort(hkey)
    kg = hkey // (cpd * cpd)
    d = hkey % (cpd * cpd)

    # --- gaps along the Hilbert curve, classified FULL/EMPTY ---
    same_g = kg[1:] == kg[:-1]
    gap = same_g & (np.diff(d) > 1)
    gi = np.nonzero(gap)[0]                # gap between d[gi], d[gi+1]
    region = closed                         # polygons + boxes have interior
    reg_gap = region[kg[gi]]
    full_gap = np.zeros(len(gi), dtype=bool)
    ri = gi[reg_gap]
    if len(ri):
        # edge-major PiP over (gap, own-ring-edge) pairs built from the
        # already-flattened scaled edges — no padded (n x E) structures
        # (they dominated generation cost).  Same semantics as
        # points_in_ring: crossing number + on-boundary override.
        from .geometry.predicates import _ON_EPS
        gx_, gy_ = d2xy(order, d[ri] + 1)
        px_ = gx_ + 0.5
        py_ = gy_ + 0.5
        gg = kg[ri]                        # geometry per gap (ascending)
        estart_geom = _ragged_starts(ne)
        cnt = ne[gg]                       # ring edges per gap
        gstart = _ragged_starts(cnt)
        M = int(cnt.sum())
        inside = np.zeros(len(ri), dtype=bool)
        on = np.zeros(len(ri), dtype=bool)
        # small chunks: ~16 doubles per pair rides in a ~2M-pair working
        # set the allocator reuses across iterations (one big chunk makes
        # the first call fault ~1 GiB of fresh pages -- measured 40x cost)
        chunk = 1 << 21
        glo = 0
        while glo < len(ri):
            ghi = int(np.searchsorted(gstart, gstart[glo] + chunk))
            ghi = min(max(ghi, glo + 1), len(ri))
            ccnt = cnt[glo:ghi]
            t_ = int(ccnt.sum())
            if t_ == 0:
                glo = ghi
                continue
            pg = np.repeat(np.arange(glo, ghi, dtype=np.int64), ccnt)
            loc = np.arange(t_, dtype=np.int64) \
                - np.repeat(_ragged_starts(ccnt), ccnt)
            ei = estart_geom[gg[pg]] + loc
            axe, aye = ex1[ei], ey1[ei]
            bxe, bye = ex2[ei], ey2[ei]
            ppx = px_[pg]
            ppy = py_[pg]
            cross = (bxe - axe) * (ppy - aye) - (bye - aye) * (ppx - axe)
            seglen = np.hypot(bxe - axe, bye - aye)
            on_e = ((np.abs(cross) <= _ON_EPS * np.maximum(seglen, 1.0))
                    & (ppx >= np.minimum(axe, bxe) - _ON_EPS)
                    & (ppx <= np.maximum(axe, bxe) + _ON_EPS)
                    & (ppy >= np.minimum(aye, bye) - _ON_EPS)
                    & (ppy <= np.maximum(aye, bye) + _ON_EPS))
            cond = (aye <= ppy) != (bye <= ppy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = axe + (ppy - aye) * (bxe - axe) / (bye - aye)
            crossing = cond & (ppx < xint)
            w = ghi - glo            # chunks split on gap boundaries
            inside[glo:ghi] = (np.bincount(pg[crossing] - glo,
                                           minlength=w) % 2) == 1
            on[glo:ghi] = np.bincount(pg[on_e] - glo, minlength=w) > 0
            glo = ghi
        full_gap[reg_gap] = inside & ~on
    is_full = np.zeros(len(kg) - 1, dtype=bool) if len(kg) > 1 \
        else np.zeros(0, dtype=bool)
    is_full[gi] = full_gap

    # --- interval assembly ---
    # ALL: break between i and i+1 at geometry change or EMPTY gap
    brk = ~same_g | (gap & ~is_full)
    starts = np.concatenate([[0], np.nonzero(brk)[0] + 1])
    ends = np.concatenate([np.nonzero(brk)[0], [len(kg) - 1]])
    a_geom = kg[starts]
    a_s = d[starts].astype(np.uint64)
    a_e = (d[ends] + 1).astype(np.uint64)
    all_counts = np.bincount(a_geom, minlength=n)
    all_vals = np.empty(2 * len(a_s), dtype=np.uint64)
    all_vals[0::2] = a_s
    all_vals[1::2] = a_e
    all_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(2 * all_counts, out=all_offs[1:])
    # FULL: the full gaps
    fi = gi[full_gap]
    f_geom = kg[fi]
    f_vals = np.empty(2 * len(fi), dtype=np.uint64)
    f_vals[0::2] = (d[fi] + 1).astype(np.uint64)
    f_vals[1::2] = d[fi + 1].astype(np.uint64)
    f_counts = np.bincount(f_geom, minlength=n)
    f_offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(2 * f_counts, out=f_offs[1:])
    return all_vals, all_offs, f_vals, f_offs


# ---------------------------------------------------------------------------
# interval-list joins (join.cpp:9-126, numpy re-expression)
# ---------------------------------------------------------------------------

# pair-id encoding for batched interval joins: interval values are < 2^33
# (max Hilbert cell id + 1 at order 16 is 2^32), so pair*2^33 + value packs
# (pair, value) into one sortable uint64 as long as pairs-per-kernel < 2^30
_PAIR_ENC = np.uint64(1) << np.uint64(33)


def _flatten_interval_rows(vals: np.ndarray, offs: np.ndarray,
                           rows: np.ndarray):
    """Intervals of ``rows`` (ListArray layout) flattened with pair ids.

    Returns (pair_of_iv, s_enc, e_enc, n_per_pair); *_enc = pair*2^33 +
    value — globally sorted because pairs ascend and lists are sorted."""
    rows = np.asarray(rows, dtype=np.int64)
    offs = np.asarray(offs, dtype=np.int64)
    cnt = (offs[rows + 1] - offs[rows]) // 2
    total = int(cnt.sum())
    pair_of = np.repeat(np.arange(len(rows), dtype=np.int64), cnt)
    local = np.arange(total, dtype=np.int64) \
        - np.repeat(np.concatenate([[0], np.cumsum(cnt[:-1])]), cnt)
    pos = offs[rows][pair_of] + 2 * local
    enc = pair_of.astype(np.uint64) * _PAIR_ENC
    s_enc = enc + vals[pos].astype(np.uint64)
    e_enc = enc + vals[pos + 1].astype(np.uint64)
    return pair_of, s_enc, e_enc, cnt


def intervals_intersect_pairs(a_vals, a_offs, a_rows,
                              b_vals, b_offs, b_rows) -> np.ndarray:
    """Vectorized :func:`intervals_intersect` over aligned row pairs:
    out[k] = intersect(intervals(a_rows[k]), intervals(b_rows[k])).
    One global searchsorted instead of a per-pair Python loop."""
    pa_of, as_enc, ae_enc, ca = _flatten_interval_rows(a_vals, a_offs,
                                                       a_rows)
    pb_of, bs_enc, be_enc, cb = _flatten_interval_rows(b_vals, b_offs,
                                                       b_rows)
    out = np.zeros(len(a_rows), dtype=bool)
    if len(as_enc) == 0 or len(bs_enc) == 0:
        return out
    idx = np.searchsorted(be_enc, as_enc, side="right")
    ok = np.nonzero(idx < len(bs_enc))[0]
    ix = idx[ok]
    hit = (pb_of[ix] == pa_of[ok]) & (bs_enc[ix] < ae_enc[ok])
    out[pa_of[ok[hit]]] = True
    return out


def intervals_contained_pairs(a_vals, a_offs, a_rows,
                              b_vals, b_offs, b_rows) -> np.ndarray:
    """Vectorized :func:`intervals_contained` over aligned row pairs
    (False where either list is empty, matching the scalar version)."""
    pa_of, as_enc, ae_enc, ca = _flatten_interval_rows(a_vals, a_offs,
                                                       a_rows)
    pb_of, bs_enc, be_enc, cb = _flatten_interval_rows(b_vals, b_offs,
                                                       b_rows)
    out = (np.asarray(ca) > 0) & (np.asarray(cb) > 0)
    if len(as_enc) == 0 or len(bs_enc) == 0:
        return np.zeros(len(a_rows), dtype=bool)
    idx = np.searchsorted(bs_enc, as_enc, side="right") - 1
    bad = idx < 0
    ix = np.clip(idx, 0, len(bs_enc) - 1)
    ok_iv = ~bad & (pb_of[ix] == pa_of) & (ae_enc <= be_enc[ix])
    out[pa_of[~ok_iv]] = False
    return out


def intervals_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """Any [s,e) of a overlaps any of b (intersectionJoinIntervalLists)."""
    if len(a) == 0 or len(b) == 0:
        return False
    as_, ae = a[0::2], a[1::2]
    bs, be = b[0::2], b[1::2]
    # first b-interval whose end > a-start; overlap iff its start < a-end
    idx = np.searchsorted(be, as_, side="right")
    valid = idx < len(bs)
    return bool((bs[idx[valid]] < ae[valid]).any())


def intervals_contained(a: np.ndarray, b: np.ndarray) -> bool:
    """Every [s,e) of a inside some [s,e) of b (insideJoinIntervalLists)."""
    if len(a) == 0 or len(b) == 0:
        return False
    as_, ae = a[0::2], a[1::2]
    bs, be = b[0::2], b[1::2]
    idx = np.searchsorted(bs, as_, side="right") - 1
    ok = (idx >= 0) & (ae <= be[np.clip(idx, 0, len(be) - 1)])
    return bool(ok.all())


def intervals_match(a: np.ndarray, b: np.ndarray) -> bool:
    """Lists identical (joinIntervalsForMatch)."""
    return len(a) == len(b) and bool(np.array_equal(a, b))


# ---------------------------------------------------------------------------
# per-predicate filter decisions
# ---------------------------------------------------------------------------

def april_filter_predicate(pred: str, a_r, f_r, a_s, f_s) -> int:
    """-> TRUE_HIT / INCONCLUSIVE / TRUE_NEGATIVE (sound; see module doc)."""
    if len(a_r) == 0 or len(a_s) == 0:
        return INCONCLUSIVE     # "no APRIL" sentinel (out-of-dataspace)
    if pred == "intersects":
        if not intervals_intersect(a_r, a_s):
            return TRUE_NEGATIVE
        if intervals_intersect(a_r, f_s) or intervals_intersect(f_r, a_s):
            return TRUE_HIT
        return INCONCLUSIVE
    if pred == "disjoint":
        if not intervals_intersect(a_r, a_s):
            return TRUE_HIT
        if intervals_intersect(a_r, f_s) or intervals_intersect(f_r, a_s):
            return TRUE_NEGATIVE
        return INCONCLUSIVE
    if pred in ("inside", "covered_by"):
        if not intervals_contained(a_r, a_s):
            return TRUE_NEGATIVE
        if pred == "covered_by" and intervals_contained(a_r, f_s):
            return TRUE_HIT     # deep containment (no boundary contact)
        return INCONCLUSIVE
    if pred in ("contains", "covers"):
        if not intervals_contained(a_s, a_r):
            return TRUE_NEGATIVE
        if pred == "covers" and intervals_contained(a_s, f_r):
            return TRUE_HIT
        return INCONCLUSIVE
    if pred == "equal":
        if not intervals_match(a_r, a_s):
            return TRUE_NEGATIVE
        return INCONCLUSIVE
    if pred == "meet":
        if not intervals_intersect(a_r, a_s):
            return TRUE_NEGATIVE
        if intervals_intersect(a_r, f_s) or intervals_intersect(f_r, a_s):
            return TRUE_NEGATIVE   # interiors overlap -> cannot touch-only
        return INCONCLUSIVE
    return INCONCLUSIVE


def april_topology(a_r, f_r, a_s, f_s, mbr_case: int) -> int | None:
    """FIND_RELATION shortcuts (sound subset of APRIL::topology,
    filter.cpp:18-223).  Returns a TR_* relation or None (refine)."""
    if len(a_r) == 0 or len(a_s) == 0:
        return None             # "no APRIL" sentinel
    if not intervals_intersect(a_r, a_s):
        return TR_DISJOINT
    interiors = (intervals_intersect(a_r, f_s)
                 or intervals_intersect(f_r, a_s))
    if mbr_case == MBR_INTERSECT:
        # outcomes: DISJOINT / MEET / INTERSECT
        return TR_INTERSECT if interiors else None
    if mbr_case == MBR_R_IN_S:
        if interiors:
            if intervals_contained(a_r, f_s):
                return TR_INSIDE          # deep inside, no boundary contact
            if not intervals_contained(a_r, a_s):
                return TR_INTERSECT       # provably pokes out of S
        return None
    if mbr_case == MBR_S_IN_R:
        if interiors:
            if intervals_contained(a_s, f_r):
                return TR_CONTAINS
            if not intervals_contained(a_s, a_r):
                return TR_INTERSECT
        return None
    if mbr_case == MBR_EQUAL:
        if interiors:
            if intervals_contained(a_r, f_s):
                return TR_INSIDE
            if intervals_contained(a_s, f_r):
                return TR_CONTAINS
            if (not intervals_contained(a_r, a_s)
                    and not intervals_contained(a_s, a_r)):
                return TR_INTERSECT
        return None
    return None


APRIL_META_KEY = b"hx_april"


def april_meta_of(ds) -> dict | None:
    """Return the persisted {'bounds': [...], 'order': n} for a Dataset
    whose schema carries the persist_april metadata, else None."""
    import json
    try:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        meta = getattr(base, "metadata", None) or {}
        raw = meta.get(APRIL_META_KEY)
        return json.loads(raw.decode()) if raw else None
    except Exception:
        return None


def persist_april(geom_ds, out_dir: str, bounds, order: int):
    """S8 analog (src/APRIL/storage.cpp:7-53): compute and persist the
    geometry table WITH its april_all/april_full columns as parquet, so
    repeated joins skip rasterization.

    The raster (bounds, order) are embedded in the parquet schema metadata
    so spatial_join can verify a persisted side matches the join's raster
    space before reusing the columns (two stores persisted at different
    orders/bounds are NOT interval-comparable)."""
    import json
    import pyarrow as pa
    gen = make_april_fn(bounds, order)
    meta = {APRIL_META_KEY: json.dumps(
        {"bounds": [float(b) for b in bounds],
         "order": int(order)}).encode()}

    def gen_with_meta(t: pa.Table) -> pa.Table:
        return gen(t).replace_schema_metadata(meta)

    geom_ds.map_batches(gen_with_meta,
                        batch_format="pyarrow").write_parquet(out_dir)


def load_april(path: str):
    """S9 analog (storage.cpp:122-192): read a persisted geometry+APRIL
    table; feeds spatial_join via cfg.intermediate_filter (the kernel uses
    the columns whenever present)."""
    import ray.data as rd
    return rd.read_parquet(path)


# ---------------------------------------------------------------------------
# map_batches stage
# ---------------------------------------------------------------------------

def make_april_fn(bounds, order: int):
    """Stage: add april_all / april_full list<uint64> columns.

    Raster bounds live in the closure (the reference keeps them in the
    rasterizer module global, generate.cpp:8-20; ST2 in SURVEY §2.3).
    """
    import pyarrow as pa

    def april_gen(t: pa.Table) -> pa.Table:
        from .stages.assign import geoms_from_table
        ids, gtypes, offs, vals, *_ = geoms_from_table(t)
        a_vals, a_offs, f_vals, f_offs = rasterize_batch(
            gtypes, offs, vals, bounds, order)
        t = t.append_column("april_all", pa.ListArray.from_arrays(
            pa.array(a_offs), pa.array(a_vals, type=pa.uint64())))
        t = t.append_column("april_full", pa.ListArray.from_arrays(
            pa.array(f_offs), pa.array(f_vals, type=pa.uint64())))
        return t

    return april_gen
