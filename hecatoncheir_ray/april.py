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
# interval-list joins (join.cpp:9-126, numpy re-expression)
# ---------------------------------------------------------------------------

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


def persist_april(geom_ds, out_dir: str, bounds, order: int):
    """S8 analog (src/APRIL/storage.cpp:7-53): compute and persist the
    geometry table WITH its april_all/april_full columns as parquet, so
    repeated joins skip rasterization."""
    gen = make_april_fn(bounds, order)
    geom_ds.map_batches(gen, batch_format="pyarrow").write_parquet(out_dir)


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
        alls, fulls = [], []
        for i in range(len(ids)):
            a, f = rasterize_geometry(int(gtypes[i]),
                                      vals[offs[i]:offs[i + 1]],
                                      bounds, order)
            alls.append(a)
            fulls.append(f)
        t = t.append_column("april_all", pa.array(
            [a.tolist() for a in alls], type=pa.list_(pa.uint64())))
        t = t.append_column("april_full", pa.array(
            [f.tolist() for f in fulls], type=pa.list_(pa.uint64())))
        return t

    return april_gen
