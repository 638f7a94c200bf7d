"""Per-partition join kernel: MBR candidate generation + dedup + refinement.

Reference equivalents:
* candidate generation — the two-layer plane sweeps
  (/root/reference/Hecatoncheir/src/TwoLayer/intersection_join_filter.cpp:31-489).
  Under Ray Data the shuffle key is a coarse partition (hash of the fine
  cell id, cfg.shuffle_parts of them) so one kernel invocation handles MANY
  fine cells: rows are numpy-sorted by cell inside the kernel and each cell
  gets a chunked vectorized all-pairs MBR test (cells are small by ppd; the
  sweep's subquadratic purpose is served by the grid itself).  This keeps
  group-call overhead O(partitions), not O(cells), and lets refinement
  batch across cells.
* duplicate avoidance — the reference's class A/B/C/D scheme
  (src/containers.cpp:1001-1034) is replaced by the equivalent PBSM
  reference-point rule (SURVEY.md §7.4): a pair is emitted only in the
  (sub-)cell owning ``(max(minx), max(miny))`` of the two MBRs.
* refinement — refinement::relate / refinement::topology
  (src/refinement/topology.cpp).  Vectorized fast paths: box-box (pure
  coordinate compares), point-areal (batched point-in-ring), point-point;
  general polygon/linestring pairs use the per-pair DE-9IM evaluator.

Emits Arrow ``(r_id, s_id[, relation])``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, GridSpec
from ..geometry.boxops import (box_find_relation, box_predicate_mask,
                               point_areal_find_relation,
                               point_areal_handled_cases)
from ..geometry.core import GT_BOX, GT_LINESTRING, GT_POINT, GT_POLYGON
from ..geometry.fast import eval_predicate
from ..geometry.predicates import (_ON_EPS, MBR_CROSS, MBR_INTERSECT,
                                   TR_DISJOINT, TR_INTERSECT, find_relation,
                                   points_in_ring, relate_mbrs_batch)
from ..grid import point_cell, ref_point_key
from .assign import geoms_from_table

PAIR_SCHEMA = pa.schema([("r_id", pa.int64()), ("s_id", pa.int64())])
REL_SCHEMA = pa.schema([("r_id", pa.int64()), ("s_id", pa.int64()),
                        ("relation", pa.int8())])

_AREAL = (GT_POLYGON, GT_BOX)


def _geom(offsets, values, i):
    return values[offsets[i]:offsets[i + 1]]


def generate_candidates(t: pa.Table, geo, grid: GridSpec, hot_cells,
                        cfg: EngineConfig):
    """All candidate pairs across every cell in this partition.

    Returns (gri, gsi): global row indices into t with inclusively
    overlapping MBRs, deduped by the reference-point rule per cell.
    """
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    side = t["side"].to_numpy(zero_copy_only=False)
    cells = t["cell_id"].to_numpy(zero_copy_only=False)
    n = len(cells)
    if n == 0:
        return (np.zeros(0, np.int64),) * 2
    order = np.argsort(cells, kind="stable")
    sc = cells[order]
    cuts = np.nonzero(np.diff(sc))[0] + 1
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [n]])
    out_r, out_s = [], []
    for a, b in zip(starts.tolist(), ends.tolist()):
        idx = order[a:b]
        cell_key = int(sc[a])
        sd = side[idx]
        r_idx = idx[sd == 0]
        s_idx = idx[sd == 1]
        if len(r_idx) == 0 or len(s_idx) == 0:
            continue
        rm0, rm1 = minx[r_idx], miny[r_idx]
        rm2, rm3 = maxx[r_idx], maxy[r_idx]
        sm0, sm1 = minx[s_idx], miny[s_idx]
        sm2, sm3 = maxx[s_idx], maxy[s_idx]
        step = max(1, cfg.pair_chunk // max(len(s_idx), 1))
        for lo in range(0, len(r_idx), step):
            hi = min(lo + step, len(r_idx))
            ov = ((rm0[lo:hi, None] <= sm2[None, :])
                  & (sm0[None, :] <= rm2[lo:hi, None])
                  & (rm1[lo:hi, None] <= sm3[None, :])
                  & (sm1[None, :] <= rm3[lo:hi, None]))
            ri, si = np.nonzero(ov)
            if len(ri):
                ri = ri + lo
                rx = np.maximum(rm0[ri], sm0[si])
                ry = np.maximum(rm1[ri], sm1[si])
                ppd2 = grid.ppd * grid.ppd
                if cfg.skew_strategy == "salt" and cell_key >= ppd2:
                    # hash-salt bucket: the (h_r, h_s) bucket structure
                    # already guarantees exactly-once within the cell, so
                    # only the cell-level reference-point test applies
                    f2 = cfg.salt_factor * cfg.salt_factor
                    base = (cell_key - ppd2) // f2
                    keep = point_cell(grid, rx, ry) == base
                else:
                    keep = ref_point_key(grid, rx, ry, hot_cells,
                                         cfg.salt_factor) == cell_key
                out_r.append(r_idx[ri[keep]])
                out_s.append(s_idx[si[keep]])
    if not out_r:
        return (np.zeros(0, np.int64),) * 2
    return np.concatenate(out_r), np.concatenate(out_s)


# ---------------------------------------------------------------------------
# refinement
# ---------------------------------------------------------------------------

def _pt_box_cls(px, py, bm, eps=_ON_EPS):
    """Point vs box classification: 1 in / 0 on / -1 out (vectorized)."""
    in_closed = ((px >= bm[:, 0] - eps) & (px <= bm[:, 2] + eps)
                 & (py >= bm[:, 1] - eps) & (py <= bm[:, 3] + eps))
    in_open = ((px > bm[:, 0] + eps) & (px < bm[:, 2] - eps)
               & (py > bm[:, 1] + eps) & (py < bm[:, 3] - eps))
    return np.where(in_open, 1, np.where(in_closed, 0, -1)).astype(np.int8)


def _pip_classify(geo, pt_idx, ar_idx):
    """cls (1/0/-1) of point rows pt_idx vs areal rows ar_idx (aligned)."""
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    px = vals[offs[pt_idx]]
    py = vals[offs[pt_idx] + 1]
    cls = np.empty(len(pt_idx), dtype=np.int8)
    is_box = gtypes[ar_idx] == GT_BOX
    if is_box.any():
        bi = ar_idx[is_box]
        bm = np.stack([minx[bi], miny[bi], maxx[bi], maxy[bi]], axis=1)
        cls[is_box] = _pt_box_cls(px[is_box], py[is_box], bm)
    poly = ~is_box
    if poly.any():
        from ..geometry.predicates import (build_padded_rings,
                                           points_in_rings_batch)
        sel = np.nonzero(poly)[0]
        uniq, inv = np.unique(ar_idx[sel], return_inverse=True)
        padded = build_padded_rings(offs, vals, uniq)
        cls[sel] = points_in_rings_batch(px[sel], py[sel], inv, padded)
    return cls


# ---------------------------------------------------------------------------
# mega-batched polygon-polygon refinement
# ---------------------------------------------------------------------------

def _verts_vs_polys(geo, src, poly):
    """(any_in, any_on) convenience wrapper over the per-pair counts."""
    n_in, n_on, _ = _verts_vs_polys_stats(geo, src, poly)
    return n_in > 0, n_on > 0


def _verts_vs_polys_stats(geo, src, poly):
    """Per-pair vertex-containment counts, fully vectorized: for each pair
    k, HOW MANY vertices of geometry src[k] are strictly inside / on the
    boundary of polygon poly[k]?  One padded-ring PiP pass over every
    vertex of every pair (no per-polygon Python loop).

    Returns (n_in, n_on, n_verts) int64 arrays aligned with the pairs.
    poly must reference GT_POLYGON rows (single rings); src may be any
    coords-pair geometry (polygon or linestring vertices).
    """
    from ..geometry.predicates import (_ON_EPS as _eps, build_padded_rings,
                                       points_in_rings_batch)
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    n_in = np.zeros(len(src), dtype=np.int64)
    n_on = np.zeros(len(src), dtype=np.int64)
    if len(src) == 0:
        return n_in, n_on, n_in.copy()
    uniq, inv = np.unique(poly, return_inverse=True)
    padded = build_padded_rings(offs, vals, uniq)
    nv = ((offs[src + 1] - offs[src]) // 2).astype(np.int64)
    E = padded[0].shape[1]
    # iterate pair-chunks (bounded (points x E) intermediates; NOT recursive
    # — skewed partitions can hold millions of pairs)
    budget = max(48, (1 << 24) // max(E, 1))
    cum = np.concatenate([[0], np.cumsum(nv)])
    lo = 0
    while lo < len(src):
        hi = int(np.searchsorted(cum, cum[lo] + budget))
        hi = min(max(hi, lo + 1), len(src))
        csrc = src[lo:hi]
        cnv = nv[lo:hi]
        total = int(cnv.sum())
        rep_starts = np.zeros(len(csrc), dtype=np.int64)
        np.cumsum(cnv[:-1], out=rep_starts[1:])
        pair_of_pt = np.repeat(np.arange(len(csrc), dtype=np.int64), cnv)
        local = np.arange(total, dtype=np.int64) \
            - np.repeat(rep_starts, cnv)
        ptpos = offs[csrc].astype(np.int64)[pair_of_pt] + 2 * local
        px = vals[ptpos]
        py = vals[ptpos + 1]
        # MBR prefilter: a vertex outside the polygon's MBR is neither
        # inside nor on it — typically drops 70%+ of the (points x E) work
        pm = poly[lo:hi][pair_of_pt]
        live = ((px >= minx[pm] - _eps) & (px <= maxx[pm] + _eps)
                & (py >= miny[pm] - _eps) & (py <= maxy[pm] + _eps))
        cls = np.full(total, -1, dtype=np.int8)
        if live.any():
            sel = np.nonzero(live)[0]
            cls[sel] = points_in_rings_batch(
                px[sel], py[sel], inv[lo:hi][pair_of_pt[sel]], padded)
        n_in[lo:hi] = np.add.reduceat(cls == 1, rep_starts)
        n_on[lo:hi] = np.add.reduceat(cls == 0, rep_starts)
        lo = hi
    return n_in, n_on, nv


def _ragged_starts(counts):
    s = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=s[1:])
    return s


def _edge_cross_batch(geo, gri, gsi, eps=_ON_EPS):
    """Mega-batched boundary-cross classification for polygon AND
    linestring pairs (open paths contribute nv-1 edges, closed rings nv).

    Returns int8 per pair: 0 = no boundary contact, 1 = touch-only,
    2 = proper crossing.  All edge pairs whose bboxes intersect the pair's
    MBR-overlap box are tested in chunked vectorized passes — no per-pair
    Python.  Semantics identical to :func:`_edge_cross_kind`.
    """
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    P = len(gri)
    if P == 0:
        return np.zeros(0, dtype=np.int8)
    ox0 = np.maximum(minx[gri], minx[gsi]) - eps
    oy0 = np.maximum(miny[gri], miny[gsi]) - eps
    ox1 = np.minimum(maxx[gri], maxx[gsi]) + eps
    oy1 = np.minimum(maxy[gri], maxy[gsi]) + eps

    def side_edges(rows):
        nv = ((offs[rows + 1] - offs[rows]) // 2).astype(np.int64)
        closed = gtypes[rows] != GT_LINESTRING
        ne = nv - 1 + closed          # open path: no wrap edge
        total = int(ne.sum())
        rep = np.repeat(np.arange(P, dtype=np.int64), ne)
        local = np.arange(total, dtype=np.int64) \
            - np.repeat(_ragged_starts(ne), ne)
        base = offs[rows].astype(np.int64)[rep] + 2 * local
        x1 = vals[base]
        y1 = vals[base + 1]
        nxt = (local + 1) % nv[rep]   # wrap only ever hit on closed rows
        base2 = offs[rows].astype(np.int64)[rep] + 2 * nxt
        x2 = vals[base2]
        y2 = vals[base2 + 1]
        keep = ((np.minimum(x1, x2) <= ox1[rep])
                & (np.maximum(x1, x2) >= ox0[rep])
                & (np.minimum(y1, y2) <= oy1[rep])
                & (np.maximum(y1, y2) >= oy0[rep]))
        return rep[keep], x1[keep], y1[keep], x2[keep], y2[keep]

    repR, p1x, p1y, p2x, p2y = side_edges(gri)
    repS, q1x, q1y, q2x, q2y = side_edges(gsi)
    cntR = np.bincount(repR, minlength=P)
    cntS = np.bincount(repS, minlength=P)
    startR = _ragged_starts(cntR)
    startS = _ragged_starts(cntS)
    combos = cntR * cntS
    proper_pair = np.zeros(P, dtype=bool)
    touch_pair = np.zeros(P, dtype=bool)
    cumc = np.concatenate([[0], np.cumsum(combos)])
    chunk = 1 << 22
    lo = 0
    while lo < P:
        hi = int(np.searchsorted(cumc, cumc[lo] + chunk))
        hi = min(max(hi, lo + 1), P)
        cp = combos[lo:hi]
        T = int(cp.sum())
        if T == 0:
            lo = hi
            continue
        pr = np.repeat(np.arange(lo, hi, dtype=np.int64), cp)
        local = np.arange(T, dtype=np.int64) \
            - np.repeat(_ragged_starts(cp), cp)
        cs = cntS[pr]
        iR = startR[pr] + local // cs
        iS = startS[pr] + local % cs
        a1x, a1y = p1x[iR], p1y[iR]
        a2x, a2y = p2x[iR], p2y[iR]
        b1x, b1y = q1x[iS], q1y[iS]
        b2x, b2y = q2x[iS], q2y[iS]
        la = np.hypot(a2x - a1x, a2y - a1y)
        lb = np.hypot(b2x - b1x, b2y - b1y)
        e = eps * np.maximum(np.maximum(la, lb), 1.0)
        d1 = (b2x - b1x) * (a1y - b1y) - (b2y - b1y) * (a1x - b1x)
        d2 = (b2x - b1x) * (a2y - b1y) - (b2y - b1y) * (a2x - b1x)
        d3 = (a2x - a1x) * (b1y - a1y) - (a2y - a1y) * (b1x - a1x)
        d4 = (a2x - a1x) * (b2y - a1y) - (a2y - a1y) * (b2x - a1x)
        proper = ((((d1 > e) & (d2 < -e)) | ((d1 < -e) & (d2 > e)))
                  & (((d3 > e) & (d4 < -e)) | ((d3 < -e) & (d4 > e))))

        def on_seg(d, px, py, ax, ay, bx, by):
            return ((np.abs(d) <= e)
                    & (px >= np.minimum(ax, bx) - eps)
                    & (px <= np.maximum(ax, bx) + eps)
                    & (py >= np.minimum(ay, by) - eps)
                    & (py <= np.maximum(ay, by) + eps))

        touch = (on_seg(d1, a1x, a1y, b1x, b1y, b2x, b2y)
                 | on_seg(d2, a2x, a2y, b1x, b1y, b2x, b2y)
                 | on_seg(d3, b1x, b1y, a1x, a1y, a2x, a2y)
                 | on_seg(d4, b2x, b2y, a1x, a1y, a2x, a2y))
        if proper.any():
            proper_pair[np.unique(pr[proper])] = True
        if touch.any():
            touch_pair[np.unique(pr[touch])] = True
        lo = hi
    return np.where(proper_pair, 2,
                    np.where(touch_pair, 1, 0)).astype(np.int8)


def _vertex_seg_leq_batch(geo, gri, gsi, d, out=None):
    """Per pair: does ANY vertex of one side come within d of a segment of
    the other (inclusive)?  Marks ``out`` in-place (or a new array).

    With intersection tested separately, this decides dist(A,B) <= d for
    disjoint geometries: two disjoint segment sets attain their minimum
    distance at a vertex of one of them.  GT_POINT rows contribute one
    degenerate (v,v) segment (the nvp=1 wrap), so point-point pairs reduce
    to plain point distance.  Vertices/edges are pruned to the other
    side's d-dilated MBR before the chunked cross product.
    """
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    P = len(gri)
    hit = out if out is not None else np.zeros(P, dtype=bool)
    if P == 0:
        return hit
    d2 = d * d

    def one_dir(vr, er):
        nvv = ((offs[vr + 1] - offs[vr]) // 2).astype(np.int64)
        repv = np.repeat(np.arange(P, dtype=np.int64), nvv)
        locv = np.arange(int(nvv.sum()), dtype=np.int64) \
            - np.repeat(_ragged_starts(nvv), nvv)
        pos = offs[vr].astype(np.int64)[repv] + 2 * locv
        px, py = vals[pos], vals[pos + 1]
        keepv = ((px >= minx[er][repv] - d) & (px <= maxx[er][repv] + d)
                 & (py >= miny[er][repv] - d) & (py <= maxy[er][repv] + d))
        repv, px, py = repv[keepv], px[keepv], py[keepv]

        nvp = ((offs[er + 1] - offs[er]) // 2).astype(np.int64)
        ne = np.where(gtypes[er] == GT_POINT, 1,
                      nvp - 1 + (gtypes[er] == GT_POLYGON))
        repe = np.repeat(np.arange(P, dtype=np.int64), ne)
        loce = np.arange(int(ne.sum()), dtype=np.int64) \
            - np.repeat(_ragged_starts(ne), ne)
        base = offs[er].astype(np.int64)[repe] + 2 * loce
        ax, ay = vals[base], vals[base + 1]
        nxt = (loce + 1) % np.maximum(nvp[repe], 1)
        base2 = offs[er].astype(np.int64)[repe] + 2 * nxt
        bx, by = vals[base2], vals[base2 + 1]
        keepe = ((np.minimum(ax, bx) <= maxx[vr][repe] + d)
                 & (np.maximum(ax, bx) >= minx[vr][repe] - d)
                 & (np.minimum(ay, by) <= maxy[vr][repe] + d)
                 & (np.maximum(ay, by) >= miny[vr][repe] - d))
        repe = repe[keepe]
        ax, ay, bx, by = ax[keepe], ay[keepe], bx[keepe], by[keepe]

        cv = np.bincount(repv, minlength=P)
        ce = np.bincount(repe, minlength=P)
        sv = _ragged_starts(cv)
        se = _ragged_starts(ce)
        combos = cv * ce
        cumc = np.concatenate([[0], np.cumsum(combos)])
        chunk = 1 << 22
        lo = 0
        while lo < P:
            hi = int(np.searchsorted(cumc, cumc[lo] + chunk))
            hi = min(max(hi, lo + 1), P)
            cp = combos[lo:hi]
            T = int(cp.sum())
            if T == 0:
                lo = hi
                continue
            pr = np.repeat(np.arange(lo, hi, dtype=np.int64), cp)
            local = np.arange(T, dtype=np.int64) \
                - np.repeat(_ragged_starts(cp), cp)
            ces = ce[pr]
            iv = sv[pr] + local // ces
            ie = se[pr] + local % ces
            ex = bx[ie] - ax[ie]
            ey = by[ie] - ay[ie]
            wx = px[iv] - ax[ie]
            wy = py[iv] - ay[ie]
            len2 = ex * ex + ey * ey
            t = np.clip((wx * ex + wy * ey)
                        / np.where(len2 > 0, len2, 1.0), 0.0, 1.0)
            dx = wx - t * ex
            dy = wy - t * ey
            ok = (dx * dx + dy * dy) <= d2
            if ok.any():
                hit[np.unique(pr[ok])] = True
            lo = hi

    one_dir(gri, gsi)
    one_dir(gsi, gri)
    return hit


def _edges_of(geo, row, cache):
    """(e,2,2) edge array + per-edge bbox for one ring, memoized per kernel
    call (rows recur across many candidate pairs)."""
    hit = cache.get(row)
    if hit is not None:
        return hit
    ids, gtypes, offs, vals, *_ = geo
    p = _geom(offs, vals, row).reshape(-1, 2)
    e = np.stack([p, np.roll(p, -1, axis=0)], axis=1)
    lo = e.min(axis=1)
    hi = e.max(axis=1)
    out = (e, lo, hi)
    cache[row] = out
    return out


def _edge_cross_kind(geo, i, j, eps=_ON_EPS, cache=None):
    """Boundary-cross test for one polygon pair, pruned to the MBR-overlap
    box: 0 = no boundary contact, 1 = touch-only, 2 = proper crossing."""
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    ox0 = max(minx[i], minx[j]) - eps
    oy0 = max(miny[i], miny[j]) - eps
    ox1 = min(maxx[i], maxx[j]) + eps
    oy1 = min(maxy[i], maxy[j]) + eps
    if cache is None:
        cache = {}

    def clipped_edges(row):
        e, lo, hi = _edges_of(geo, row, cache)
        m = ((lo[:, 0] <= ox1) & (hi[:, 0] >= ox0)
             & (lo[:, 1] <= oy1) & (hi[:, 1] >= oy0))
        return e[m]

    er = clipped_edges(i)
    es = clipped_edges(j)
    if len(er) == 0 or len(es) == 0:
        return 0
    p1 = er[:, 0][:, None, :]
    p2 = er[:, 1][:, None, :]
    q1 = es[:, 0][None, :, :]
    q2 = es[:, 1][None, :, :]
    la = np.hypot(p2[..., 0] - p1[..., 0], p2[..., 1] - p1[..., 1])
    lb = np.hypot(q2[..., 0] - q1[..., 0], q2[..., 1] - q1[..., 1])
    e = eps * np.maximum(np.maximum(la, lb), 1.0)

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = orient(q1[..., 0], q1[..., 1], q2[..., 0], q2[..., 1],
                p1[..., 0], p1[..., 1])
    d2 = orient(q1[..., 0], q1[..., 1], q2[..., 0], q2[..., 1],
                p2[..., 0], p2[..., 1])
    d3 = orient(p1[..., 0], p1[..., 1], p2[..., 0], p2[..., 1],
                q1[..., 0], q1[..., 1])
    d4 = orient(p1[..., 0], p1[..., 1], p2[..., 0], p2[..., 1],
                q2[..., 0], q2[..., 1])
    proper = (((d1 > e) & (d2 < -e)) | ((d1 < -e) & (d2 > e))) \
        & (((d3 > e) & (d4 < -e)) | ((d3 < -e) & (d4 > e)))
    if proper.any():
        return 2

    def on_seg(d, px, py, ax, ay, bx, by):
        return ((np.abs(d) <= e)
                & (px >= np.minimum(ax, bx) - eps)
                & (px <= np.maximum(ax, bx) + eps)
                & (py >= np.minimum(ay, by) - eps)
                & (py <= np.maximum(ay, by) + eps))

    touch = (on_seg(d1, p1[..., 0], p1[..., 1], q1[..., 0], q1[..., 1],
                    q2[..., 0], q2[..., 1])
             | on_seg(d2, p2[..., 0], p2[..., 1], q1[..., 0], q1[..., 1],
                      q2[..., 0], q2[..., 1])
             | on_seg(d3, q1[..., 0], q1[..., 1], p1[..., 0], p1[..., 1],
                      p2[..., 0], p2[..., 1])
             | on_seg(d4, q2[..., 0], q2[..., 1], p1[..., 0], p1[..., 1],
                      p2[..., 0], p2[..., 1]))
    return 1 if touch.any() else 0


# per-pair fallback counters (in-process; tests assert the mega-batched
# paths leave the slow remainder at ~0 on realistic layers)
PAIR_FALLBACKS = {"refine_rest": 0, "refine_undecided": 0,
                  "relation_rest": 0, "relation_touch": 0,
                  "relation_april": 0}


def reset_pair_fallbacks():
    for k in PAIR_FALLBACKS:
        PAIR_FALLBACKS[k] = 0


_CONT_PREDS = ("inside", "covered_by", "contains", "covers", "equal", "meet")


def _containment_batch(geo, sub_r, sub_s, predicate, april=None):
    """Staged mega-batch for the containment-family predicates over
    polygon/linestring pairs (per-pair ``eval_predicate`` only survives in
    the returned ``undecided`` remainder).

    Soundness of the vectorized rules (simple single rings, matching the
    eps conventions of the per-pair kernels):

    * kinds = 0 (no boundary contact): an edge cannot leave the other
      geometry's interior without crossing its boundary, so
      all-vertices-strictly-in <=> closure containment with no contact,
      and no-vertex-in on both sides <=> disjoint.
    * kinds = 2 (proper crossing): each boundary provably reaches the
      other's exterior -> containment / equal / meet are all False.
    * kinds = 1 (touch-only): False is still conclusive when a vertex is
      strictly outside (containment), strictly inside (meet), or off the
      boundary (equal); what remains — containment-with-touch and exact
      equality candidates — is the undecided remainder.

    Reference semantics: refinement::relate masks (topology.cpp; boost
    within/covered_by/equals/meet).  Returns (keep, undecided) aligned
    with the pairs.
    """
    ids, gtypes, offs, vals, *_ = geo
    P = len(sub_r)
    keep = np.zeros(P, dtype=bool)
    und = np.zeros(P, dtype=bool)
    decided = np.zeros(P, dtype=bool)

    if april is not None:
        # J5 intermediate filter, vectorized per predicate
        # (src/APRIL/filter.cpp:229-339 dispatch)
        from ..april import intervals_contained_pairs
        ao, av, fo, fv = april
        ao64 = np.asarray(ao, dtype=np.int64)
        valid = (((ao64[sub_r + 1] - ao64[sub_r]) > 0)
                 & ((ao64[sub_s + 1] - ao64[sub_s]) > 0))
        if predicate in ("inside", "covered_by"):
            c_rs = intervals_contained_pairs(av, ao, sub_r, av, ao, sub_s)
            decided |= valid & ~c_rs              # pokes out -> False
            if predicate == "covered_by":
                hitm = valid & intervals_contained_pairs(av, ao, sub_r,
                                                         fv, fo, sub_s)
                keep |= hitm & ~decided           # deep containment
                decided |= hitm
        elif predicate in ("contains", "covers"):
            c_sr = intervals_contained_pairs(av, ao, sub_s, av, ao, sub_r)
            decided |= valid & ~c_sr
            if predicate == "covers":
                hitm = valid & intervals_contained_pairs(av, ao, sub_s,
                                                         fv, fo, sub_r)
                keep |= hitm & ~decided
                decided |= hitm
        elif predicate == "equal":
            c_rs = intervals_contained_pairs(av, ao, sub_r, av, ao, sub_s)
            c_sr = intervals_contained_pairs(av, ao, sub_s, av, ao, sub_r)
            decided |= valid & ~(c_rs & c_sr)     # lists differ -> not equal
        elif predicate == "meet":
            hit, neg = _april_intersects_decision(april, sub_r, sub_s)
            decided |= hit | neg   # interiors overlap / disjoint: not meet

    rem = np.nonzero(~decided)[0]
    if len(rem) == 0:
        return keep, und
    rr, rs = sub_r[rem], sub_s[rem]
    gtr = gtypes[rr]
    gts = gtypes[rs]
    rpoly = gtr == GT_POLYGON
    spoly = gts == GT_POLYGON
    kinds = _edge_cross_batch(geo, rr, rs)
    kp = np.zeros(len(rem), dtype=bool)
    ru = np.zeros(len(rem), dtype=bool)

    def stats(src_rows, poly_rows, mask):
        n_in = np.zeros(len(rem), dtype=np.int64)
        n_on = np.zeros(len(rem), dtype=np.int64)
        nv = np.ones(len(rem), dtype=np.int64)
        mi = np.nonzero(mask)[0]
        if len(mi):
            a, b, c = _verts_vs_polys_stats(geo, src_rows[mi], poly_rows[mi])
            n_in[mi], n_on[mi], nv[mi] = a, b, c
        return n_in, n_on, nv

    if predicate in ("inside", "covered_by", "contains", "covers"):
        if predicate in ("inside", "covered_by"):
            a_rows, b_rows, b_is_poly, a_is_poly = rr, rs, spoly, rpoly
        else:
            a_rows, b_rows, b_is_poly, a_is_poly = rs, rr, rpoly, spoly
        # b not areal: a polygon can never sit inside a line (False,
        # decided); line-in-line stays per-pair (rare layers)
        ru |= ~b_is_poly & ~a_is_poly
        ain, aon, anv = stats(a_rows, b_rows, b_is_poly)
        # b's vertices strictly inside a => b's boundary dips into a
        # (kills covered_by/covers for areal pairs)
        bin_, _, _ = stats(b_rows, a_rows, b_is_poly & a_is_poly)
        all_strict = b_is_poly & (ain == anv)
        all_closed = b_is_poly & (ain + aon == anv)
        if predicate in ("inside", "contains"):
            # strict: any boundary contact at all falsifies
            kp |= (kinds == 0) & all_strict
            # eps-asymmetry guard: vertices all in/on but no detected
            # touch cannot be decided cheaply
            ru |= (kinds == 0) & all_closed & ~all_strict
        else:
            kp |= (kinds == 0) & all_strict & (bin_ == 0)
            ru |= (all_closed & (kinds == 1) & (bin_ == 0)
                   | ((kinds == 0) & all_closed & ~all_strict))
    elif predicate == "equal":
        # equality needs every vertex of each boundary ON the other
        ron = stats(rr, rs, spoly)
        son = stats(rs, rr, rpoly)
        cand = (spoly & rpoly & (ron[1] == ron[2]) & (son[1] == son[2])
                & (kinds != 2))
        ru |= cand
        ru |= ~rpoly & ~spoly          # line-line equality: per-pair
    elif predicate == "meet":
        rin = stats(rr, rs, spoly)[0]
        sin_ = stats(rs, rr, rpoly)[0]
        # touch-only contact with no strict interior entry is the only
        # possible meet; everything else is conclusively not-meet
        ru |= (kinds == 1) & (rin == 0) & (sin_ == 0)

    keep[rem] = kp
    und[rem] = ru & ~kp
    return keep, und
# point-side refinement modes (cls thresholds) per predicate
_PT_MODES_R = {"intersects": "in_or_on", "inside": "strict",
               "covered_by": "in_or_on", "meet": "on", "disjoint": "out"}
_PT_MODES_S = {"intersects": "in_or_on", "contains": "strict",
               "covers": "in_or_on", "meet": "on", "disjoint": "out"}
_CLS_KEEP = {"in_or_on": lambda c: c >= 0, "strict": lambda c: c == 1,
             "on": lambda c: c == 0, "out": lambda c: c == -1}


def _list_col_np(t: pa.Table, name: str):
    """Arrow list column -> (offsets, values) numpy views."""
    col = t[name]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = pa.array([], type=pa.list_(pa.uint64()))
    return np.asarray(arr.offsets), np.asarray(arr.values)


def _april_of(april, i):
    ao, av, fo, fv = april
    return av[ao[i]:ao[i + 1]], fv[fo[i]:fo[i + 1]]


def _april_intersects_decision(april, r_rows, s_rows):
    """Vectorized APRIL filter for intersects-style pairs (J5,
    join.cpp:9-126 semantics, batched): -> (hit, neg) bool arrays.
    hit: interiors provably overlap (A_r x F_s or F_r x A_s intersect).
    neg: A-lists disjoint (valid only when both lists are non-empty; the
    empty list is the out-of-dataspace sentinel -> inconclusive)."""
    from ..april import intervals_intersect_pairs
    ao, av, fo, fv = april
    ao = np.asarray(ao, dtype=np.int64)
    fo = np.asarray(fo, dtype=np.int64)
    valid = (((ao[r_rows + 1] - ao[r_rows]) > 0)
             & ((ao[s_rows + 1] - ao[s_rows]) > 0))
    inter_aa = intervals_intersect_pairs(av, ao, r_rows, av, ao, s_rows)
    hit = (intervals_intersect_pairs(av, ao, r_rows, fv, fo, s_rows)
           | intervals_intersect_pairs(fv, fo, r_rows, av, ao, s_rows))
    return hit, valid & ~inter_aa


def _april_topology_batch(april, r_rows, s_rows, mbr_cases, interiors):
    """Vectorized ``april_topology`` containment dispatch (J6,
    src/APRIL/filter.cpp:18-223 + join.cpp MBR*JoinAPRIL): one pairwise
    interval join per direction instead of a per-pair Python loop.
    ``interiors`` must already be ANDed with list-validity by the caller.
    Returns (rel, decided).

    Mirrors every CONCLUSIVE outcome of the reference's dispatch,
    including the empty-FULL-list branch (a geometry smaller than one
    raster cell has no FULL intervals: A-containment + F_r x A_s overlap
    is then a conclusive INTERSECT, join.cpp MBRRinSContainmentJoinAPRIL
    case 2-else) and the AA-MATCH exclusion on the MBR_EQUAL path (equal
    A-lists route to the equality refinement, never to a premature
    INSIDE/CONTAINS — join.cpp MBREqualJoinAPRIL).  The reference's
    REFINE_* codes restrict which relations the refinement must test;
    here the refinement computes the full DE-9IM matrix in one
    vectorized pass, so the restriction changes no answers and the
    undecided remainder simply falls through to the mega-batched
    geometric stages.  (Deliberate deviation, documented: the
    reference's APRIL-on MBR_EQUAL path can emit TR_MEET via a geometric
    isMeet probe, which its own APRIL-OFF path never does
    (topology.cpp:272-291) — we mirror the APRIL-off semantics on both
    paths so filter-on == filter-off holds, which the stage-equivalence
    tests assert.)"""
    from ..april import intervals_contained_pairs
    ao, av, fo, fv = april
    P = len(r_rows)
    rel = np.full(P, TR_INTERSECT, dtype=np.int8)
    decided = np.zeros(P, dtype=bool)
    cont = interiors & (mbr_cases != MBR_INTERSECT)
    if not cont.any():
        return rel, decided
    c_rs_f = intervals_contained_pairs(av, ao, r_rows, fv, fo, s_rows)
    c_rs_a = intervals_contained_pairs(av, ao, r_rows, av, ao, s_rows)
    c_sr_f = intervals_contained_pairs(av, ao, s_rows, fv, fo, r_rows)
    c_sr_a = intervals_contained_pairs(av, ao, s_rows, av, ao, r_rows)
    fo = np.asarray(fo, dtype=np.int64)
    fs_empty = (fo[s_rows + 1] - fo[s_rows]) == 0
    fr_empty = (fo[r_rows + 1] - fo[r_rows]) == 0
    match = c_rs_a & c_sr_a            # identical A-lists (IL_MATCH)
    from ..geometry.predicates import (MBR_EQUAL, MBR_R_IN_S, MBR_S_IN_R,
                                       TR_CONTAINS, TR_INSIDE)
    m = cont & (mbr_cases == MBR_R_IN_S)
    mm = m & c_rs_f
    rel[mm] = TR_INSIDE
    decided |= mm
    mm = m & ~c_rs_f & ~c_rs_a
    rel[mm] = TR_INTERSECT        # provably pokes out of S
    decided |= mm
    # A_r inside A_s but S has no FULL cells: interiors overlap is
    # conclusive INTERSECT (hit here means F_r x A_s since F_s is empty)
    mm = m & c_rs_a & ~c_rs_f & fs_empty
    rel[mm] = TR_INTERSECT
    decided |= mm
    m = cont & (mbr_cases == MBR_S_IN_R)
    mm = m & c_sr_f
    rel[mm] = TR_CONTAINS
    decided |= mm
    mm = m & ~c_sr_f & ~c_sr_a
    rel[mm] = TR_INTERSECT
    decided |= mm
    mm = m & c_sr_a & ~c_sr_f & fr_empty
    rel[mm] = TR_INTERSECT
    decided |= mm
    m = cont & (mbr_cases == MBR_EQUAL) & ~match
    mm = m & c_rs_a & c_rs_f
    rel[mm] = TR_INSIDE
    decided |= mm
    mm = m & ~c_rs_f & c_sr_a & c_sr_f
    rel[mm] = TR_CONTAINS
    decided |= mm
    mm = m & ~c_rs_f & ~c_sr_f & ~c_rs_a & ~c_sr_a
    rel[mm] = TR_INTERSECT
    decided |= mm
    return rel, decided


def refine_mask(cfg: EngineConfig, geo, gri, gsi, predicate: str,
                april=None) -> np.ndarray:
    """Vectorized-dispatch refinement: keep-mask over candidate pairs."""
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    npairs = len(gri)
    keep = np.zeros(npairs, dtype=bool)
    done = np.zeros(npairs, dtype=bool)
    gtr = gtypes[gri]
    gts = gtypes[gsi]

    bb = (gtr == GT_BOX) & (gts == GT_BOX)
    if bb.any():
        rm = np.stack([minx[gri[bb]], miny[gri[bb]],
                       maxx[gri[bb]], maxy[gri[bb]]], axis=1)
        sm = np.stack([minx[gsi[bb]], miny[gsi[bb]],
                       maxx[gsi[bb]], maxy[gsi[bb]]], axis=1)
        keep[bb] = box_predicate_mask(predicate, rm, sm)
        done |= bb

    pa_mask = (gtr == GT_POINT) & np.isin(gts, _AREAL) & ~done
    if pa_mask.any() and predicate in _PT_MODES_R:
        cls = _pip_classify(geo, gri[pa_mask], gsi[pa_mask])
        keep[pa_mask] = _CLS_KEEP[_PT_MODES_R[predicate]](cls)
        done |= pa_mask

    ap_mask = (gts == GT_POINT) & np.isin(gtr, _AREAL) & ~done
    if ap_mask.any() and predicate in _PT_MODES_S:
        cls = _pip_classify(geo, gsi[ap_mask], gri[ap_mask])
        keep[ap_mask] = _CLS_KEEP[_PT_MODES_S[predicate]](cls)
        done |= ap_mask

    # polygon-polygon intersects/disjoint: mega-batched (grouped vertex
    # containment resolves most pairs; pruned edge-cross test the rest)
    poly2 = (gtr == GT_POLYGON) & (gts == GT_POLYGON) & ~done
    if poly2.any() and predicate in ("intersects", "disjoint"):
        sel = np.nonzero(poly2)[0]
        hit = np.zeros(len(sel), dtype=bool)
        neg = np.zeros(len(sel), dtype=bool)
        if april is not None:
            # J5 intermediate filter, vectorized: conclusive pairs skip
            # the geometric refinement entirely (the reference's thesis,
            # src/APRIL/join.cpp)
            hit, neg = _april_intersects_decision(april, gri[sel],
                                                  gsi[sel])
        und0 = np.nonzero(~hit & ~neg)[0]
        if len(und0):
            sub_r, sub_s = gri[sel[und0]], gsi[sel[und0]]
            r_in, r_on = _verts_vs_polys(geo, sub_r, sub_s)
            s_in, s_on = _verts_vs_polys(geo, sub_s, sub_r)
            h2 = r_in | r_on | s_in | s_on
            und = np.nonzero(~h2)[0]
            if len(und):
                kinds = _edge_cross_batch(geo, sub_r[und], sub_s[und])
                h2[und] = kinds > 0
            hit[und0] = h2
        keep[sel] = hit if predicate == "intersects" else ~hit
        done |= poly2

    # linestring-involved intersects/disjoint: same staged mega-batch as
    # polygon-polygon (T8NA-style workloads; VERDICT r1 item 8).  A line
    # meets a polygon iff a line vertex is in/on it or an edge crosses the
    # ring (a traversal with all vertices outside must cross the boundary);
    # two lines meet iff some edge pair crosses/touches (collinear overlap
    # always puts one segment's endpoint on the other).
    line_mix = (((gtr == GT_POLYGON) & (gts == GT_LINESTRING))
                | ((gtr == GT_LINESTRING) & (gts == GT_POLYGON))
                | ((gtr == GT_LINESTRING) & (gts == GT_LINESTRING))) & ~done
    if line_mix.any() and predicate in ("intersects", "disjoint"):
        sel = np.nonzero(line_mix)[0]
        hit = np.zeros(len(sel), dtype=bool)
        neg = np.zeros(len(sel), dtype=bool)
        if april is not None:
            hit, neg = _april_intersects_decision(april, gri[sel],
                                                  gsi[sel])
        open_ = np.nonzero(~hit & ~neg)[0]
        rpoly = gtr[sel[open_]] == GT_POLYGON
        if rpoly.any():               # r polygon, s line: s verts vs r
            m = open_[rpoly]
            s_in, s_on = _verts_vs_polys(geo, gsi[sel[m]], gri[sel[m]])
            hit[m] |= s_in | s_on
        spoly = gts[sel[open_]] == GT_POLYGON
        if spoly.any():
            m = open_[spoly]
            r_in, r_on = _verts_vs_polys(geo, gri[sel[m]], gsi[sel[m]])
            hit[m] |= r_in | r_on
        und = open_[~hit[open_]]
        if len(und):
            kinds = _edge_cross_batch(geo, gri[sel[und]], gsi[sel[und]])
            hit[und] = kinds > 0
        keep[sel] = hit if predicate == "intersects" else ~hit
        done |= line_mix

    # polygon/linestring containment-family predicates: staged mega-batch
    # (the per-pair evaluator only runs on the touch/equality remainder,
    # which is ~0 on realistic layers — see PAIR_FALLBACKS)
    pl_cont = (np.isin(gtr, (GT_POLYGON, GT_LINESTRING))
               & np.isin(gts, (GT_POLYGON, GT_LINESTRING)) & ~done)
    if pl_cont.any() and predicate in _CONT_PREDS:
        sel = np.nonzero(pl_cont)[0]
        kp, und = _containment_batch(geo, gri[sel], gsi[sel], predicate,
                                     april)
        keep[sel] = kp
        for u in np.nonzero(und)[0].tolist():
            PAIR_FALLBACKS["refine_undecided"] += 1
            i, j = int(gri[sel[u]]), int(gsi[sel[u]])
            keep[sel[u]] = eval_predicate(predicate, int(gtypes[i]),
                                          _geom(offs, vals, i),
                                          int(gtypes[j]),
                                          _geom(offs, vals, j))
        done |= pl_cont

    pp = (gtr == GT_POINT) & (gts == GT_POINT) & ~done
    if pp.any():
        dx = vals[offs[gri[pp]]] - vals[offs[gsi[pp]]]
        dy = vals[offs[gri[pp]] + 1] - vals[offs[gsi[pp]] + 1]
        eq = np.hypot(dx, dy) <= _ON_EPS
        if predicate in ("intersects", "inside", "covered_by", "contains",
                         "covers", "equal"):
            keep[pp] = eq
        elif predicate == "disjoint":
            keep[pp] = ~eq
        else:  # meet: point boundaries are empty -> never touches
            keep[pp] = False
        done |= pp

    rest = np.nonzero(~done)[0]
    if len(rest) and april is not None:
        # APRIL intermediate filter (J5, src/APRIL/filter.cpp:229-339):
        # conclusive TRUE_HIT / TRUE_NEGATIVE skip exact refinement
        from ..april import april_filter_predicate
        for k in rest.tolist():
            PAIR_FALLBACKS["refine_rest"] += 1
            i, j = int(gri[k]), int(gsi[k])
            a_r, f_r = _april_of(april, i)
            a_s, f_s = _april_of(april, j)
            dec = april_filter_predicate(predicate, a_r, f_r, a_s, f_s)
            if dec != 0:
                keep[k] = dec > 0
            else:
                keep[k] = eval_predicate(predicate, int(gtypes[i]),
                                         _geom(offs, vals, i),
                                         int(gtypes[j]),
                                         _geom(offs, vals, j))
        return keep
    for k in rest.tolist():
        PAIR_FALLBACKS["refine_rest"] += 1
        i, j = int(gri[k]), int(gsi[k])
        keep[k] = eval_predicate(predicate, int(gtypes[i]),
                                 _geom(offs, vals, i), int(gtypes[j]),
                                 _geom(offs, vals, j))
    return keep


def classify_relations(cfg: EngineConfig, geo, gri, gsi,
                       april=None) -> np.ndarray:
    """FIND_RELATION over candidate pairs (mirrors forwardPair +
    specializedRefinementEntrypoint; MBR_CROSS is dead code upstream)."""
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    mbr_cases = relate_mbrs_batch(minx[gri], miny[gri], maxx[gri], maxy[gri],
                                  minx[gsi], miny[gsi], maxx[gsi], maxy[gsi])
    rel = np.full(len(gri), TR_INTERSECT, dtype=np.int8)
    if not cfg.refinement:
        return rel
    done = np.zeros(len(gri), dtype=bool)
    gtr = gtypes[gri]
    gts = gtypes[gsi]

    if april is not None:
        # APRIL topology filter (J6, src/APRIL/filter.cpp:18-223): sound
        # conclusive relations skip geometric classification.  Both the
        # dominant MBR_INTERSECT dispatch (DISJOINT / interiors-overlap ->
        # INTERSECT) and the containment MBR cases are vectorized via the
        # pairwise interval joins — no per-pair Python.
        aa_sel = np.nonzero(np.isin(gtr, _AREAL) & np.isin(gts, _AREAL))[0]
        if len(aa_sel):
            hit, neg = _april_intersects_decision(april, gri[aa_sel],
                                                  gsi[aa_sel])
            rel[aa_sel[neg]] = TR_DISJOINT
            done[aa_sel[neg]] = True
            m_int = mbr_cases[aa_sel] == MBR_INTERSECT
            ih = m_int & hit & ~neg
            rel[aa_sel[ih]] = TR_INTERSECT
            done[aa_sel[ih]] = True
            sub = np.nonzero(~neg & ~m_int)[0]
            if len(sub):
                relb, decb = _april_topology_batch(
                    april, gri[aa_sel[sub]], gsi[aa_sel[sub]],
                    mbr_cases[aa_sel[sub]], hit[sub])
                rel[aa_sel[sub[decb]]] = relb[decb]
                done[aa_sel[sub[decb]]] = True

    bb = (gtr == GT_BOX) & (gts == GT_BOX)
    if bb.any():
        rm = np.stack([minx[gri[bb]], miny[gri[bb]],
                       maxx[gri[bb]], maxy[gri[bb]]], axis=1)
        sm = np.stack([minx[gsi[bb]], miny[gsi[bb]],
                       maxx[gsi[bb]], maxy[gsi[bb]]], axis=1)
        rel[bb] = box_find_relation(rm, sm, mbr_cases[bb])
        done |= bb

    for point_is_r in (True, False):
        if point_is_r:
            m = (gtr == GT_POINT) & np.isin(gts, _AREAL) & ~done
        else:
            m = (gts == GT_POINT) & np.isin(gtr, _AREAL) & ~done
        if m.any():
            handled = point_areal_handled_cases(mbr_cases[m], point_is_r)
            mm = np.nonzero(m)[0][handled]
            if len(mm):
                pt = gri[mm] if point_is_r else gsi[mm]
                ar = gsi[mm] if point_is_r else gri[mm]
                cls = _pip_classify(geo, pt, ar)
                rel[mm] = point_areal_find_relation(cls, mbr_cases[mm],
                                                    point_is_r)
                done[mm] = True

    # polygon-polygon with MBR_INTERSECT: staged mega-batch shortcut.  The
    # reference path is refineDisjointMeetIntersect (topology.cpp:178-192):
    # outcomes only DISJOINT / MEET / INTERSECT.  Grouped vertex containment
    # + pruned edge-cross decide almost every pair; only touch-only contact
    # without a strict interior proof pays for full relate (MEET vs
    # INTERSECT via collinear chains).
    aa = ((gtr == GT_POLYGON) & (gts == GT_POLYGON) & ~done
          & (mbr_cases == MBR_INTERSECT))
    if aa.any():
        sel = np.nonzero(aa)[0]
        r_in, r_on = _verts_vs_polys(geo, gri[sel], gsi[sel])
        s_in, s_on = _verts_vs_polys(geo, gsi[sel], gri[sel])
        strict = r_in | s_in
        rel[sel[strict]] = TR_INTERSECT      # interiors provably overlap
        und = np.nonzero(~strict)[0]
        if len(und):
            kinds = _edge_cross_batch(geo, gri[sel[und]], gsi[sel[und]])
            rel[sel[und[kinds == 2]]] = TR_INTERSECT   # proper crossing
            no_contact = (kinds == 0) & ~(r_on[und] | s_on[und])
            rel[sel[und[no_contact]]] = TR_DISJOINT
            # touch-only remainder: MEET vs INTERSECT needs full relate
            for u in und[(kinds != 2) & ~no_contact].tolist():
                PAIR_FALLBACKS["relation_touch"] += 1
                i, j = int(gri[sel[u]]), int(gsi[sel[u]])
                rel[sel[u]] = find_relation(
                    int(gtypes[i]), _geom(offs, vals, i),
                    int(gtypes[j]), _geom(offs, vals, j), MBR_INTERSECT)
        done |= aa

    # polygon-polygon with an MBR containment case (R_IN_S / S_IN_R /
    # EQUAL), not decided by APRIL: same staged mega-batch.  With no
    # boundary contact, all-vertices-strictly-in <=> INSIDE/CONTAINS and
    # no-vertices-in <=> DISJOINT (reference quirk: the MBR_EQUAL path
    # never tests disjoint, so no-contact no-containment -> INTERSECT,
    # topology.cpp:272-291).  Touch / possible-equality pairs remain
    # per-pair.
    aa2 = ((gtr == GT_POLYGON) & (gts == GT_POLYGON) & ~done
           & (mbr_cases != MBR_INTERSECT))
    if aa2.any():
        from ..geometry.predicates import (MBR_EQUAL, MBR_R_IN_S,
                                           MBR_S_IN_R, TR_CONTAINS,
                                           TR_INSIDE)
        sel = np.nonzero(aa2)[0]
        kinds = _edge_cross_batch(geo, gri[sel], gsi[sel])
        rin, ron, rnv = _verts_vs_polys_stats(geo, gri[sel], gsi[sel])
        sin_, son, snv = _verts_vs_polys_stats(geo, gsi[sel], gri[sel])
        mc = mbr_cases[sel]
        k0 = kinds == 0
        out = np.full(len(sel), TR_INTERSECT, dtype=np.int8)
        dec = kinds == 2                      # proper crossing: INTERSECT
        all_r = rin == rnv
        all_s = sin_ == snv
        none_in = (rin == 0) & (sin_ == 0)
        eq_cand = (ron == rnv) & (son == snv) & (kinds != 2)
        for case, strict_all, tr in ((MBR_R_IN_S, all_r, TR_INSIDE),
                                     (MBR_S_IN_R, all_s, TR_CONTAINS)):
            c = mc == case
            m = c & k0 & strict_all
            out[m] = tr
            dec |= m
            m = c & k0 & none_in & ~strict_all
            out[m] = TR_DISJOINT
            dec |= m
        c = mc == MBR_EQUAL
        m = c & k0 & all_r & ~eq_cand
        out[m] = TR_INSIDE
        dec |= m
        m = c & k0 & all_s & ~eq_cand
        out[m] = TR_CONTAINS
        dec |= m
        m = c & k0 & none_in & ~eq_cand & ~all_r & ~all_s
        out[m] = TR_INTERSECT
        dec |= m
        rel[sel[dec]] = out[dec]
        done[sel[dec]] = True

    rest = np.nonzero(~done)[0]
    for k in rest.tolist():
        PAIR_FALLBACKS["relation_rest"] += 1
        if mbr_cases[k] == MBR_CROSS:    # parity: unreachable
            rel[k] = TR_INTERSECT
            continue
        i, j = int(gri[k]), int(gsi[k])
        rel[k] = find_relation(int(gtypes[i]), _geom(offs, vals, i),
                               int(gtypes[j]), _geom(offs, vals, j),
                               int(mbr_cases[k]))
    return rel


def make_join_kernel(cfg: EngineConfig, grid: GridSpec, predicate: str,
                     hot_cells=None, metrics_scope: str | None = None):
    """Build the per-partition map_groups kernel."""
    hot = (np.asarray(hot_cells, dtype=np.int64)
           if hot_cells is not None and len(hot_cells) else None)
    find_rel = predicate == "find_relation"
    schema = REL_SCHEMA if find_rel else PAIR_SCHEMA

    def report(rows_in: int, candidates: int, kernel_ms: int):
        if metrics_scope is None:
            return
        try:
            import ray
            actor = ray.get_actor("hec_metrics")
            actor.add.remote(metrics_scope, rows_in=rows_in,
                             candidates=candidates, partitions=1,
                             kernel_ms=kernel_ms)
        except Exception:
            pass    # metrics are best-effort; never fail the kernel

    def kernel(t: pa.Table) -> pa.Table:
        import time as _time
        _t0 = _time.perf_counter()
        geo = geoms_from_table(t)
        gri, gsi = generate_candidates(t, geo, grid, hot, cfg)
        if len(gri) == 0:
            report(len(t), 0, int(1000 * (_time.perf_counter() - _t0)))
            return schema.empty_table()
        april = None
        if "april_all" in t.column_names:
            april = (*_list_col_np(t, "april_all"),
                     *_list_col_np(t, "april_full"))
        ids = geo[0]
        if find_rel:
            rel = classify_relations(cfg, geo, gri, gsi, april)
            report(len(t), len(gri),
                   int(1000 * (_time.perf_counter() - _t0)))
            return pa.table({"r_id": ids[gri], "s_id": ids[gsi],
                             "relation": rel}, schema=REL_SCHEMA)
        if not cfg.refinement:
            keep = np.ones(len(gri), dtype=bool)
        else:
            keep = refine_mask(cfg, geo, gri, gsi, predicate, april)
        report(len(t), len(gri), int(1000 * (_time.perf_counter() - _t0)))
        return pa.table({"r_id": ids[gri[keep]], "s_id": ids[gsi[keep]]},
                        schema=PAIR_SCHEMA)

    kernel.__name__ = f"join_{predicate}"
    return kernel


def mbr_candidates(rm, sm, cell_key, grid: GridSpec,
                   hot_cells, salt_factor: int, pair_chunk: int):
    """Single-cell candidate helper (kept for tests/diagnostics)."""
    n, m = len(rm), len(sm)
    if n == 0 or m == 0:
        return (np.zeros(0, np.int64),) * 2
    out_r, out_s = [], []
    step = max(1, pair_chunk // max(m, 1))
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        r = rm[lo:hi]
        ov = ((r[:, None, 0] <= sm[None, :, 2])
              & (sm[None, :, 0] <= r[:, None, 2])
              & (r[:, None, 1] <= sm[None, :, 3])
              & (sm[None, :, 1] <= r[:, None, 3]))
        ri, si = np.nonzero(ov)
        if len(ri):
            ri = ri + lo
            rx = np.maximum(rm[ri, 0], sm[si, 0])
            ry = np.maximum(rm[ri, 1], sm[si, 1])
            keep = ref_point_key(grid, rx, ry, hot_cells, salt_factor) \
                == cell_key
            out_r.append(ri[keep])
            out_s.append(si[keep])
    if not out_r:
        return (np.zeros(0, np.int64),) * 2
    return np.concatenate(out_r), np.concatenate(out_s)
