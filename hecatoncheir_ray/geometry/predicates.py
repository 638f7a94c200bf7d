"""Exact topological predicates (DE-9IM) for the supported geometry types.

Replaces boost::geometry in the reference (GeometryWrapper predicate methods,
/root/reference/Hecatoncheir/include/containers.h:1451-1543, and the DE-9IM
mask logic in /root/reference/Hecatoncheir/src/refinement/topology.cpp).

The single primitive is :func:`relate`, which computes the 3x3 boolean
DE-9IM matrix (True = non-empty intersection of the two parts) between two
geometries via *boundary arrangement + midpoint classification*:

1. split each geometry's segments at every intersection with the other's
   boundary,
2. classify each sub-segment midpoint (and polyline endpoints) as
   inside / on / outside the other geometry,
3. read the nine cells off those classifications.

All named predicates (intersects, within/inside, coveredBy, contains, covers,
touches/meets, equals, disjoint) and the FIND_RELATION classification derive
from the matrix, mirroring the reference's boost semantics:

* ``inside``   = boost::within  (strict: false on any boundary contact)
* ``covered_by`` = boost::covered_by (closure containment)
* ``meets``    = boost::touches
* masks for the relate-based paths are the ones at topology.cpp:10-29.

Masks only ever test T/F (never dimension), so booleans suffice.
"""

from __future__ import annotations

import numpy as np

from .core import (GT_BOX, GT_LINESTRING, GT_POINT, GT_POLYGON,
                   box_to_ring, coords_to_pts, ring_closed, ring_open)

# Topological relations, reference API/def.h:34-43
TR_DISJOINT = 0
TR_EQUAL = 1
TR_INSIDE = 2
TR_CONTAINS = 3
TR_MEET = 4
TR_COVERS = 5
TR_COVERED_BY = 6
TR_INTERSECT = 7

TR_NAMES = {TR_DISJOINT: "disjoint", TR_EQUAL: "equal", TR_INSIDE: "inside",
            TR_CONTAINS: "contains", TR_MEET: "meet", TR_COVERS: "covers",
            TR_COVERED_BY: "covered_by", TR_INTERSECT: "intersect"}

# MBR relation cases, reference include/def.h (MBRRelationCase)
MBR_INTERSECT = 0
MBR_R_IN_S = 1
MBR_S_IN_R = 2
MBR_EQUAL = 3
MBR_CROSS = 4

_PAR_EPS = 1e-12     # parameter-space epsilon for segment intersection t/u
_ON_EPS = 1e-09      # absolute distance-ish epsilon for on-boundary tests
# NOTE on epsilon semantics: on-boundary/collinearity thresholds scale with
# each edge's own length (perpendicular-distance tests), so for edges of
# wildly different lengths with sub-epsilon gaps (~<1e-7) the touch
# classification is direction-dependent.  Geographic data (degree
# coordinates; gaps exactly 0 or far above 1e-7) cannot hit this band;
# hypothesis-found knife-edge floats (1e-308-sized boxes) can.


# ---------------------------------------------------------------------------
# low-level vectorized primitives
# ---------------------------------------------------------------------------

def points_on_segments_mask(px, py, ax, ay, bx, by, eps=_ON_EPS):
    """(k,) pts vs (m,) segments -> (k,m) bool 'point lies on segment'."""
    px = px[:, None]; py = py[:, None]
    ax = ax[None, :]; ay = ay[None, :]
    bx = bx[None, :]; by = by[None, :]
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    seglen = np.hypot(bx - ax, by - ay)
    on_line = np.abs(cross) <= eps * np.maximum(seglen, 1.0)
    inx = (px >= np.minimum(ax, bx) - eps) & (px <= np.maximum(ax, bx) + eps)
    iny = (py >= np.minimum(ay, by) - eps) & (py <= np.maximum(ay, by) + eps)
    return on_line & inx & iny


def points_in_ring(pts: np.ndarray, ring: np.ndarray, eps=_ON_EPS) -> np.ndarray:
    """Classify points against a single (unclosed) ring.

    Returns int8 array: 1 = strictly inside, 0 = on boundary, -1 = outside.
    Even-odd crossing number with an explicit on-boundary override
    (reference pipTest: containers.h:1070-1072 via boost).
    """
    pts = np.atleast_2d(pts)
    px, py = pts[:, 0], pts[:, 1]
    ax, ay = ring[:, 0], ring[:, 1]
    bx, by = np.roll(ax, -1), np.roll(ay, -1)
    on = points_on_segments_mask(px, py, ax, ay, bx, by, eps).any(axis=1)
    # crossing number (half-open rule avoids double counting at vertices)
    pyc = py[:, None]
    pxc = px[:, None]
    cond = (ay[None, :] <= pyc) != (by[None, :] <= pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = ax[None, :] + (pyc - ay[None, :]) * (bx[None, :] - ax[None, :]) \
            / (by[None, :] - ay[None, :])
    crossings = (cond & (pxc < xint)).sum(axis=1)
    inside = (crossings % 2) == 1
    out = np.where(on, 0, np.where(inside, 1, -1)).astype(np.int8)
    return out


def build_padded_rings(offs: np.ndarray, vals: np.ndarray, rows: np.ndarray,
                       eps=_ON_EPS):
    """Pad the rings of ``rows`` (indices into an Arrow list-column layout)
    to a common edge count for batched point-in-ring computation, with all
    per-edge quantities precomputed ONCE per ring (edge deltas, bboxes,
    scaled epsilon, inverse dy) — points then only gather + compare.
    """
    rows = np.asarray(rows, dtype=np.int64)
    nv = ((offs[rows + 1] - offs[rows]) // 2).astype(np.int64)
    E = int(nv.max()) if len(nv) else 1
    k = np.arange(E, dtype=np.int64)[None, :]
    safe_k = np.minimum(k, nv[:, None] - 1)
    base = offs[rows].astype(np.int64)[:, None]
    idx = base + 2 * safe_k
    ax = vals[idx]
    ay = vals[idx + 1]
    nxt = (safe_k + 1) % nv[:, None]
    idx2 = base + 2 * nxt
    bx = vals[idx2]
    by = vals[idx2 + 1]
    valid = k < nv[:, None]
    dx = bx - ax
    dy = by - ay
    e_on = eps * np.maximum(np.hypot(dx, dy), 1.0)
    exmin = np.minimum(ax, bx) - eps
    exmax = np.maximum(ax, bx) + eps
    eymin = np.minimum(ay, by) - eps
    eymax = np.maximum(ay, by) + eps
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_dy = np.where(dy != 0, 1.0 / np.where(dy != 0, dy, 1.0), 0.0)
    return (ax, ay, dx, dy, valid, e_on, exmin, exmax, eymin, eymax,
            inv_dy, by, nv)


def points_in_rings_batch(px: np.ndarray, py: np.ndarray,
                          ring_of_pt: np.ndarray, padded,
                          eps=_ON_EPS) -> np.ndarray:
    """Classify P points, each against its own ring, vectorized and
    cache-blocked (the working set per block stays ~MB-sized so the ~10
    elementwise passes hit cache instead of streaming DRAM — this kernel is
    bandwidth-bound at scale).  Semantics identical to
    :func:`points_in_ring` (1 in / 0 on / -1 out).
    """
    (ax, ay, dxe, dye, valid, e_on, exmin, exmax, eymin, eymax,
     inv_dy, by, nv) = padded
    E = ax.shape[1]
    out = np.empty(len(px), dtype=np.int8)
    # process points sorted by (ring size, ring): same-ring points read the
    # ring's padded rows as contiguous repeated gathers (L1-resident across
    # that ring's points) instead of random DRAM hits, AND each block's
    # rings share a similar edge count so the block computes over only its
    # own max-E columns — no paying the batch-max padding for small rings
    pt_nv = nv[ring_of_pt]
    order = np.lexsort((ring_of_pt, pt_nv))
    px = px[order]
    py = py[order]
    ring_of_pt = ring_of_pt[order]
    pt_nv = pt_nv[order]
    sorted_out = np.empty(len(px), dtype=np.int8)
    block = max(64, (1 << 15) // max(E, 1))
    for lo in range(0, len(px), block):
        hi = min(lo + block, len(px))
        g = ring_of_pt[lo:hi]
        e = int(pt_nv[lo:hi].max())          # block-local edge count
        sl = slice(0, e)
        A_x = ax[:, sl][g]
        A_y = ay[:, sl][g]
        D_x = dxe[:, sl][g]
        D_y = dye[:, sl][g]
        V = valid[:, sl][g]
        pxc = px[lo:hi, None]
        pyc = py[lo:hi, None]
        rx = pxc - A_x
        ry = pyc - A_y
        cross = D_x * ry - D_y * rx
        on = (V & (np.abs(cross) <= e_on[:, sl][g])
              & (pxc >= exmin[:, sl][g]) & (pxc <= exmax[:, sl][g])
              & (pyc >= eymin[:, sl][g]) & (pyc <= eymax[:, sl][g])) \
            .any(axis=1)
        cond = V & ((A_y <= pyc) != (by[:, sl][g] <= pyc))
        xint = A_x + ry * D_x * inv_dy[:, sl][g]
        crossings = (cond & (pxc < xint)).sum(axis=1)
        inside = (crossings % 2) == 1
        sorted_out[lo:hi] = np.where(on, 0, np.where(inside, 1, -1))
    out[order] = sorted_out
    return out


def points_on_polyline(pts: np.ndarray, line: np.ndarray, eps=_ON_EPS) -> np.ndarray:
    """(k,2) pts vs polyline (n,2) -> bool (k,) point lies on the polyline."""
    pts = np.atleast_2d(pts)
    ax, ay = line[:-1, 0], line[:-1, 1]
    bx, by = line[1:, 0], line[1:, 1]
    return points_on_segments_mask(pts[:, 0], pts[:, 1], ax, ay, bx, by,
                                   eps).any(axis=1)


def _seg_params(A: np.ndarray, B: np.ndarray):
    """All intersections between segment sets A (n,2,2) and B (m,2,2).

    Returns (tA, uB, pts, pairs): arrays over intersection *events*.  Each
    point event contributes a split parameter t on the A segment and u on the
    B segment.  Collinear overlaps contribute their two overlap endpoints as
    events on both segments.
    """
    n, m = len(A), len(B)
    if n == 0 or m == 0:
        z = np.zeros(0)
        return z, z, np.zeros((0, 2)), np.zeros((0, 2), dtype=np.int64)
    p = A[:, 0][:, None, :]          # (n,1,2)
    r = (A[:, 1] - A[:, 0])[:, None, :]
    q = B[:, 0][None, :, :]          # (1,m,2)
    s = (B[:, 1] - B[:, 0])[None, :, :]
    qp = q - p
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]       # (n,m)
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    rlen = np.linalg.norm(r, axis=-1)
    slen = np.linalg.norm(s, axis=-1)
    scale = np.maximum(rlen * slen, 1e-300)
    parallel = np.abs(rxs) <= 1e-12 * scale
    collinear = parallel & (np.abs(qpxr) <= _ON_EPS * np.maximum(rlen, 1.0))

    tA_list, uB_list, pts_list, pair_list = [], [], [], []

    # --- proper / endpoint point intersections -----------------------------
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(~parallel, qpxs / rxs, np.nan)
        u = np.where(~parallel, qpxr / rxs, np.nan)
    hit = (~parallel & (t >= -_PAR_EPS) & (t <= 1 + _PAR_EPS)
           & (u >= -_PAR_EPS) & (u <= 1 + _PAR_EPS))
    ii, jj = np.nonzero(hit)
    if len(ii):
        tt = np.clip(t[ii, jj], 0.0, 1.0)
        uu = np.clip(u[ii, jj], 0.0, 1.0)
        ptx = A[ii, 0, 0] + tt * (A[ii, 1, 0] - A[ii, 0, 0])
        pty = A[ii, 0, 1] + tt * (A[ii, 1, 1] - A[ii, 0, 1])
        tA_list.append(tt); uB_list.append(uu)
        pts_list.append(np.stack([ptx, pty], axis=1))
        pair_list.append(np.stack([ii, jj], axis=1))

    # --- collinear overlaps -------------------------------------------------
    ci, cj = np.nonzero(collinear)
    for i, j in zip(ci.tolist(), cj.tolist()):
        a0, a1 = A[i]
        b0, b1 = B[j]
        d = a1 - a0
        dd = float(d @ d)
        if dd <= 0:
            continue
        t0 = float((b0 - a0) @ d) / dd
        t1 = float((b1 - a0) @ d) / dd
        lo, hi = min(t0, t1), max(t0, t1)
        lo, hi = max(lo, 0.0), min(hi, 1.0)
        if hi < lo - _PAR_EPS:
            continue        # no overlap
        for tv in (lo, hi):
            pt = a0 + tv * d
            db = b1 - b0
            ddb = float(db @ db)
            uv = float((pt - b0) @ db) / ddb if ddb > 0 else 0.0
            tA_list.append(np.array([tv]))
            uB_list.append(np.array([np.clip(uv, 0.0, 1.0)]))
            pts_list.append(pt[None, :])
            pair_list.append(np.array([[i, j]]))

    if not tA_list:
        z = np.zeros(0)
        return z, z, np.zeros((0, 2)), np.zeros((0, 2), dtype=np.int64)
    return (np.concatenate(tA_list), np.concatenate(uB_list),
            np.concatenate(pts_list), np.concatenate(pair_list))


def _edges(pts: np.ndarray, closed: bool) -> np.ndarray:
    """(n,2) vertex array -> (e,2,2) segment array."""
    if closed:
        nxt = np.roll(pts, -1, axis=0)
        return np.stack([pts, nxt], axis=1)
    return np.stack([pts[:-1], pts[1:]], axis=1)


def _sub_midpoints(E: np.ndarray, seg_idx: np.ndarray, tvals: np.ndarray):
    """Split segments E at per-event (seg_idx, t) and return midpoints of
    every sub-segment (including untouched segments' own midpoints)."""
    mids = []
    n = len(E)
    per = [[0.0, 1.0] for _ in range(n)]
    for k in range(len(seg_idx)):
        per[int(seg_idx[k])].append(float(tvals[k]))
    for i in range(n):
        ts = np.unique(np.clip(np.array(per[i]), 0.0, 1.0))
        tm = (ts[:-1] + ts[1:]) / 2.0
        tm = tm[(ts[1:] - ts[:-1]) > _PAR_EPS]
        if len(tm):
            a, b = E[i, 0], E[i, 1]
            mids.append(a[None, :] + tm[:, None] * (b - a)[None, :])
    if not mids:
        return np.zeros((0, 2))
    return np.concatenate(mids)


# ---------------------------------------------------------------------------
# relate(): DE-9IM boolean matrix
# ---------------------------------------------------------------------------

def _norm(gtype: int, coords: np.ndarray):
    """-> ('A'|'L'|'P', pts).  Boxes become 4-vertex rings."""
    p = coords_to_pts(coords)
    if gtype == GT_POINT:
        return "P", p
    if gtype == GT_LINESTRING:
        return "L", p
    if gtype == GT_BOX:
        return "A", box_to_ring(coords)
    if gtype == GT_POLYGON:
        return "A", ring_open(p)
    raise ValueError(f"bad gtype {gtype}")


def relate(gtype_r: int, coords_r: np.ndarray,
           gtype_s: int, coords_s: np.ndarray) -> np.ndarray:
    """DE-9IM boolean 3x3 matrix between R and S.

    rows = Interior/Boundary/Exterior of R; cols = same for S.
    ``m[i,j]`` True <=> the parts intersect.
    """
    kr, pr = _norm(gtype_r, coords_r)
    ks, ps = _norm(gtype_s, coords_s)
    if (kr, ks) == ("A", "A"):
        return _relate_aa(pr, ps)
    if (kr, ks) == ("A", "L"):
        return _relate_al(pr, ps)
    if (kr, ks) == ("L", "A"):
        return _relate_al(ps, pr).T
    if (kr, ks) == ("A", "P"):
        return _relate_ap(pr, ps)
    if (kr, ks) == ("P", "A"):
        return _relate_ap(ps, pr).T
    if (kr, ks) == ("L", "L"):
        return _relate_ll(pr, ps)
    if (kr, ks) == ("L", "P"):
        return _relate_lp(pr, ps)
    if (kr, ks) == ("P", "L"):
        return _relate_lp(ps, pr).T
    if (kr, ks) == ("P", "P"):
        return _relate_pp(pr, ps)
    raise AssertionError


def _relate_aa(R: np.ndarray, S: np.ndarray) -> np.ndarray:
    """Polygon(ring R) x Polygon(ring S)."""
    ER, ES = _edges(R, True), _edges(S, True)
    tA, uB, _, pairs = _seg_params(ER, ES)
    rmids = _sub_midpoints(ER, pairs[:, 0], tA)
    smids = _sub_midpoints(ES, pairs[:, 1], uB)
    rc = points_in_ring(rmids, S)      # R-boundary sub-edges vs S
    sc = points_in_ring(smids, R)      # S-boundary sub-edges vs R
    r_in, r_on, r_out = (rc == 1).any(), (rc == 0).any(), (rc == -1).any()
    s_in, s_on, s_out = (sc == 1).any(), (sc == 0).any(), (sc == -1).any()
    any_bb = len(pairs) > 0 or r_on or s_on
    all_on = (len(rc) > 0 and (rc == 0).all()
              and len(sc) > 0 and (sc == 0).all())
    m = np.zeros((3, 3), dtype=bool)
    m[0, 0] = bool(r_in or s_in or all_on)                 # II
    m[0, 1] = bool(s_in)                                   # I(R) ∩ B(S)
    m[0, 2] = bool(r_out or s_in)                          # I(R) ∩ E(S)
    m[1, 0] = bool(r_in)                                   # B(R) ∩ I(S)
    m[1, 1] = bool(any_bb)                                 # B ∩ B
    m[1, 2] = bool(r_out)                                  # B(R) ∩ E(S)
    m[2, 0] = bool(s_out or r_in)                          # E(R) ∩ I(S)
    m[2, 1] = bool(s_out)                                  # E(R) ∩ B(S)
    m[2, 2] = True
    return m


def _relate_al(A: np.ndarray, L: np.ndarray) -> np.ndarray:
    """Polygon(ring A) x LineString L (rows = polygon)."""
    EA, EL = _edges(A, True), _edges(L, False)
    tA, uB, ipts, pairs = _seg_params(EA, EL)
    lmids = _sub_midpoints(EL, pairs[:, 1], uB)
    lc = points_in_ring(lmids, A)
    closed = (L[0] == L[-1]).all()
    eps_pts = np.zeros((0, 2)) if closed else np.vstack([L[0], L[-1]])
    ec = points_in_ring(eps_pts, A) if len(eps_pts) else np.zeros(0, np.int8)
    # intersection points interior to L (not equal to an L endpoint)
    int_pts_interior_L = False
    if len(ipts):
        if closed:
            int_pts_interior_L = True
        else:
            d0 = np.hypot(ipts[:, 0] - L[0, 0], ipts[:, 1] - L[0, 1])
            d1 = np.hypot(ipts[:, 0] - L[-1, 0], ipts[:, 1] - L[-1, 1])
            int_pts_interior_L = bool(((d0 > _ON_EPS) & (d1 > _ON_EPS)).any())
    # ring sub-midpoints on L (for B(A) ∩ E(L))
    amids = _sub_midpoints(EA, pairs[:, 0], tA)
    a_on_l = points_on_polyline(amids, L) if len(amids) else np.zeros(0, bool)
    m = np.zeros((3, 3), dtype=bool)
    m[0, 0] = bool((lc == 1).any())                        # I(A) ∩ I(L)
    m[0, 1] = bool((ec == 1).any())                        # I(A) ∩ B(L)
    m[0, 2] = True                                         # area minus line
    m[1, 0] = bool((lc == 0).any() or int_pts_interior_L)  # B(A) ∩ I(L)
    m[1, 1] = bool((ec == 0).any())                        # B(A) ∩ B(L)
    m[1, 2] = bool((~a_on_l).any()) if len(a_on_l) else True
    m[2, 0] = bool((lc == -1).any())
    m[2, 1] = bool((ec == -1).any())
    m[2, 2] = True
    return m


def _relate_ap(A: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Polygon(ring A) x Point (rows = polygon)."""
    c = int(points_in_ring(P.reshape(1, 2), A)[0])
    m = np.zeros((3, 3), dtype=bool)
    m[0, 0] = c == 1
    m[1, 0] = c == 0
    m[2, 0] = c == -1
    m[0, 2] = True   # interior minus a point still nonempty
    m[1, 2] = True
    m[2, 2] = True
    return m


def _line_boundary(L: np.ndarray) -> np.ndarray:
    if (L[0] == L[-1]).all():
        return np.zeros((0, 2))
    return np.vstack([L[0], L[-1]])


def _relate_ll(L1: np.ndarray, L2: np.ndarray) -> np.ndarray:
    E1, E2 = _edges(L1, False), _edges(L2, False)
    t1, u2, ipts, pairs = _seg_params(E1, E2)
    b1, b2 = _line_boundary(L1), _line_boundary(L2)

    def is_bnd(pts, bnd):
        if len(bnd) == 0 or len(pts) == 0:
            return np.zeros(len(pts), dtype=bool)
        d = np.hypot(pts[:, None, 0] - bnd[None, :, 0],
                     pts[:, None, 1] - bnd[None, :, 1])
        return (d <= _ON_EPS).any(axis=1)

    m = np.zeros((3, 3), dtype=bool)
    if len(ipts):
        p_b1 = is_bnd(ipts, b1)
        p_b2 = is_bnd(ipts, b2)
        m[0, 0] |= bool((~p_b1 & ~p_b2).any())
        m[0, 1] |= bool((~p_b1 & p_b2).any())
        m[1, 0] |= bool((p_b1 & ~p_b2).any())
        m[1, 1] |= bool((p_b1 & p_b2).any())
    # collinear-overlap interiors
    m1 = _sub_midpoints(E1, pairs[:, 0], t1)
    m2 = _sub_midpoints(E2, pairs[:, 1], u2)
    on1 = points_on_polyline(m1, L2) if len(m1) else np.zeros(0, bool)
    on2 = points_on_polyline(m2, L1) if len(m2) else np.zeros(0, bool)
    m[0, 0] |= bool(on1.any() or on2.any())
    m[0, 2] |= bool((~on1).any()) if len(on1) else False
    m[2, 0] |= bool((~on2).any()) if len(on2) else False
    # boundaries vs the other line
    if len(b1):
        onl2 = points_on_polyline(b1, L2)
        bb = is_bnd(b1, b2)
        m[1, 0] |= bool((onl2 & ~bb).any())
        m[1, 1] |= bool(bb.any())
        m[1, 2] |= bool((~onl2).any())
    if len(b2):
        onl1 = points_on_polyline(b2, L1)
        bb = is_bnd(b2, b1)
        m[0, 1] |= bool((onl1 & ~bb).any())
        m[2, 1] |= bool((~onl1).any())
    m[2, 2] = True
    return m


def _relate_lp(L: np.ndarray, P: np.ndarray) -> np.ndarray:
    b = _line_boundary(L)
    on_b = len(b) > 0 and bool(
        (np.hypot(b[:, 0] - P[0, 0], b[:, 1] - P[0, 1]) <= _ON_EPS).any())
    on_l = bool(points_on_polyline(P.reshape(1, 2), L)[0])
    m = np.zeros((3, 3), dtype=bool)
    m[0, 0] = on_l and not on_b
    m[1, 0] = on_b
    m[2, 0] = not on_l
    m[0, 2] = True
    m[1, 2] = len(b) > 0
    m[2, 2] = True
    return m


def _relate_pp(P1: np.ndarray, P2: np.ndarray) -> np.ndarray:
    eq = bool(np.hypot(P1[0, 0] - P2[0, 0], P1[0, 1] - P2[0, 1]) <= _ON_EPS)
    m = np.zeros((3, 3), dtype=bool)
    m[0, 0] = eq
    m[0, 2] = not eq
    m[2, 0] = not eq
    m[2, 2] = True
    return m


# ---------------------------------------------------------------------------
# named predicates (boost semantics, containers.h:1451-1543)
# ---------------------------------------------------------------------------

def intersects_m(m): return bool(m[0, 0] | m[0, 1] | m[1, 0] | m[1, 1])
def disjoint_m(m): return not intersects_m(m)


def covered_by_m(m):
    return intersects_m(m) and not m[0, 2] and not m[1, 2]


def inside_m(m):
    """boost::within — strict, no contact with S's boundary."""
    return (bool(m[0, 0]) and not m[0, 1] and not m[0, 2]
            and not m[1, 1] and not m[1, 2])


def meets_m(m):
    return (not m[0, 0]) and bool(m[0, 1] | m[1, 0] | m[1, 1])


def equals_m(m):
    return (bool(m[0, 0]) and not m[0, 2] and not m[1, 2]
            and not m[2, 0] and not m[2, 1])


def predicate(name: str, gtype_r, coords_r, gtype_s, coords_s) -> bool:
    m = relate(gtype_r, coords_r, gtype_s, coords_s)
    if name == "intersects":
        return intersects_m(m)
    if name == "disjoint":
        return disjoint_m(m)
    if name == "inside":
        return inside_m(m)
    if name == "covered_by":
        return covered_by_m(m)
    if name == "contains":
        return inside_m(m.T)
    if name == "covers":
        return covered_by_m(m.T)
    if name == "meet":
        return meets_m(m)
    if name == "equal":
        return equals_m(m)
    raise ValueError(f"unknown predicate {name}")


# ---------------------------------------------------------------------------
# FIND_RELATION (reference: topology.cpp + topology_join_filter.cpp)
# ---------------------------------------------------------------------------

def relate_mbrs(r_minx, r_miny, r_maxx, r_maxy,
                s_minx, s_miny, s_maxx, s_maxy, eps=1e-08) -> int:
    """Decision tree of relateMBRs (topology_join_filter.cpp:38-113),
    mirrored verbatim including precedence and EPS=1e-8.

    NOTE: in the reference, the two MBR_CROSS branches are unsatisfiable dead
    code — each sits in the ``else`` of a d_ymin comparison and then requires
    the opposite sign of d_ymin (lines 74 and 97).  Crossing MBRs therefore
    classify as MBR_INTERSECT, and the forwardPair MBR_CROSS shortcut
    (immediate TR_INTERSECT) never fires.  Mirrored faithfully.
    """
    d_xmin = r_minx - s_minx
    d_ymin = r_miny - s_miny
    d_xmax = r_maxx - s_maxx
    d_ymax = r_maxy - s_maxy
    if abs(d_xmin) < eps and abs(d_xmax) < eps \
            and abs(d_ymin) < eps and abs(d_ymax) < eps:
        return MBR_EQUAL
    if d_xmin <= 0 and d_xmax >= 0:
        if d_ymin <= 0:
            if d_ymax >= 0:
                return MBR_S_IN_R
        elif d_ymax < 0 and d_xmax > 0 and d_xmin < 0 and d_ymin < 0:
            return MBR_CROSS          # unreachable (reference parity)
    if d_xmin >= 0 and d_xmax <= 0:
        if d_ymin >= 0:
            if d_ymax <= 0:
                return MBR_R_IN_S
        elif d_ymax > 0 and d_xmax < 0 and d_xmin > 0 and d_ymin > 0:
            return MBR_CROSS          # unreachable (reference parity)
    return MBR_INTERSECT


def relate_mbrs_batch(r_minx, r_miny, r_maxx, r_maxy,
                      s_minx, s_miny, s_maxx, s_maxy, eps=1e-08) -> np.ndarray:
    """Vectorized :func:`relate_mbrs` over aligned MBR arrays."""
    d_xmin = np.asarray(r_minx) - s_minx
    d_ymin = np.asarray(r_miny) - s_miny
    d_xmax = np.asarray(r_maxx) - s_maxx
    d_ymax = np.asarray(r_maxy) - s_maxy
    eq = ((np.abs(d_xmin) < eps) & (np.abs(d_xmax) < eps)
          & (np.abs(d_ymin) < eps) & (np.abs(d_ymax) < eps))
    s_in_r = ((d_xmin <= 0) & (d_xmax >= 0) & (d_ymin <= 0) & (d_ymax >= 0))
    r_in_s = ((d_xmin >= 0) & (d_xmax <= 0) & (d_ymin >= 0) & (d_ymax <= 0))
    # priority: EQUAL > S_IN_R > R_IN_S > INTERSECT (MBR_CROSS is dead code)
    return np.select([eq, s_in_r, r_in_s],
                     [MBR_EQUAL, MBR_S_IN_R, MBR_R_IN_S],
                     default=MBR_INTERSECT).astype(np.int8)


def _covered_by_any(m):   # the 4 coveredBy masks, topology.cpp:12-15
    return ((m[0, 0] or m[0, 1] or m[1, 0] or m[1, 1])
            and not m[0, 2] and not m[1, 2])


def _covers_any(m):       # the 4 covers masks, topology.cpp:18-21
    return ((m[0, 0] or m[0, 1] or m[1, 0] or m[1, 1])
            and not m[2, 0] and not m[2, 1])


def _mask_inside(m):      # insideCode "T*F**F***"
    return bool(m[0, 0]) and not m[0, 2] and not m[1, 2]


def _mask_contains(m):    # containsCode "T*****FF*"
    return bool(m[0, 0]) and not m[2, 0] and not m[2, 1]


def _mask_meet(m):        # meetCode1..3
    return ((not m[0, 0]) and (m[0, 1] or m[1, 0] or m[1, 1]))


def _mask_disjoint(m):    # "FF*FF****"
    return not (m[0, 0] or m[0, 1] or m[1, 0] or m[1, 1])


def find_relation(gtype_r, coords_r, gtype_s, coords_s,
                  mbr_case: int) -> int:
    """specializedRefinementEntrypoint (topology.cpp:297-325): classify a
    candidate pair into one TR_* relation given the MBR relation case.

    NOTE the reference quirks mirrored here: in the MBR_EQUAL path covers is
    reported as TR_CONTAINS and covered_by as TR_INSIDE (topology.cpp:272-291),
    and the MBR_EQUAL / non-disjoint paths never test disjoint/meet.
    MBR_CROSS never reaches here (immediate TR_INTERSECT upstream).
    """
    m = relate(gtype_r, coords_r, gtype_s, coords_s)
    if mbr_case == MBR_R_IN_S:
        # refineDisjointInsideCoveredbyMeetIntersect
        if _mask_disjoint(m):
            return TR_DISJOINT
        if _covered_by_any(m):
            return TR_INSIDE if _mask_inside(m) else TR_COVERED_BY
        if _mask_meet(m):
            return TR_MEET
        return TR_INTERSECT
    if mbr_case == MBR_S_IN_R:
        # refineDisjointContainsCoversMeetIntersect
        if _mask_disjoint(m):
            return TR_DISJOINT
        if _covers_any(m):
            return TR_CONTAINS if _mask_contains(m) else TR_COVERS
        if _mask_meet(m):
            return TR_MEET
        return TR_INTERSECT
    if mbr_case == MBR_EQUAL:
        # refineEqualCoversCoveredbyTrueHitIntersect
        if equals_m(m):
            return TR_EQUAL
        if _covers_any(m):
            return TR_CONTAINS
        if _covered_by_any(m):
            return TR_INSIDE
        return TR_INTERSECT
    # MBR_INTERSECT: refineDisjointMeetIntersect
    if _mask_disjoint(m):
        return TR_DISJOINT
    if _mask_meet(m):
        return TR_MEET
    return TR_INTERSECT


def de9im_mask(m: np.ndarray) -> str:
    """Boolean DE-9IM matrix -> 9-char T/F mask string (row-major).

    Reference: Shape::createMaskCode (containers.h:1076-1087) returns the
    boost relate matrix string; dimensions are collapsed to T here (the
    reference's own mask comparisons only test T vs F,
    topology.cpp:73-95)."""
    return "".join("T" if m[i, j] else "F"
                   for i in range(3) for j in range(3))


def create_mask_code(gtype_r, coords_r, gtype_s, coords_s) -> str:
    """createMaskCode equivalent: the DE-9IM mask string for a pair."""
    return de9im_mask(relate(gtype_r, coords_r, gtype_s, coords_s))


# ---------------------------------------------------------------------------
# distance (reference containers.h:1419-1426 — point distance)
# ---------------------------------------------------------------------------

def point_distance(c1: np.ndarray, c2: np.ndarray) -> float:
    p1, p2 = coords_to_pts(c1)[0], coords_to_pts(c2)[0]
    return float(np.hypot(p1[0] - p2[0], p1[1] - p2[1]))
