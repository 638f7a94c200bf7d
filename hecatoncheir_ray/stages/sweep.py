"""Per-cell join kernel: MBR candidate generation + dedup + refinement.

Reference equivalents:
* candidate generation — the two-layer plane sweeps
  (/root/reference/Hecatoncheir/src/TwoLayer/intersection_join_filter.cpp:31-489).
  Under Ray Data each grid cell arrives as one group after the
  ``groupby(cell_id)`` shuffle; within a cell we use chunked vectorized
  all-pairs MBR tests (cells are sized small by ``ppd``; the sweep's purpose
  — subquadratic candidate generation across a whole node shard — is served
  by the grid itself).
* duplicate avoidance — the reference's class A/B/C/D scheme
  (src/containers.cpp:1001-1034) is replaced by the equivalent PBSM
  reference-point rule (see SURVEY.md §7.4): a pair is emitted only in the
  (sub-)cell owning ``(max(minx), max(miny))`` of the two MBRs.
* refinement — refinement::relate / refinement::topology
  (src/refinement/topology.cpp), here via geometry.predicates.

The kernel emits candidate or refined pairs as an Arrow table
``(r_id, s_id[, relation])``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, GridSpec
from ..geometry.core import GT_BOX, GT_POINT, GT_POLYGON
from ..geometry.fast import eval_predicate, points_in_polygon_batch
from ..geometry.predicates import (MBR_CROSS, TR_INTERSECT, find_relation,
                                   relate_mbrs_batch)
from ..grid import ref_point_key
from .assign import geoms_from_table

PAIR_SCHEMA = pa.schema([("r_id", pa.int64()), ("s_id", pa.int64())])
REL_SCHEMA = pa.schema([("r_id", pa.int64()), ("s_id", pa.int64()),
                        ("relation", pa.int8())])


def mbr_candidates(rm, sm, cell_key, grid: GridSpec,
                   hot_cells, salt_factor: int, pair_chunk: int):
    """Chunked all-pairs inclusive MBR-overlap test + reference-point dedup.

    rm/sm: (n,4) arrays (minx,miny,maxx,maxy).  Returns (ri, si) index pairs.
    """
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


def _geom(offsets, values, i):
    return values[offsets[i]:offsets[i + 1]]


_AREAL = (GT_POLYGON, GT_BOX)


def _refine_point_in_areal(ri, si, pgeo, ageo, mode: str):
    """Vectorized refinement when one side is all points, other all areal.

    pgeo: (ids, gtypes, offs, vals, ...) of the POINT side, ageo of the areal
    side; ri/si index into point side / areal side respectively.
    mode: 'in_or_on' (intersects/covered_by) | 'strict' (within) |
    'on' (meet) | 'out' (disjoint).
    Returns boolean keep mask over the pairs.
    """
    _, _, poffs, pvals, pminx, pminy, *_ = pgeo
    _, agt, aoffs, avals, *_ = ageo
    px = pvals[poffs[ri]]
    py = pvals[poffs[ri] + 1]
    keep = np.zeros(len(ri), dtype=bool)
    order = np.argsort(si, kind="stable")
    si_o = si[order]
    bounds = np.searchsorted(si_o, np.unique(si_o), side="left").tolist() \
        + [len(si_o)]
    uniq = np.unique(si_o)
    for k, s in enumerate(uniq.tolist()):
        sel = order[bounds[k]:bounds[k + 1]]
        cls = points_in_polygon_batch(px[sel], py[sel], int(agt[s]),
                                      _geom(aoffs, avals, s))
        if mode == "in_or_on":
            keep[sel] = cls >= 0
        elif mode == "strict":
            keep[sel] = cls == 1
        elif mode == "on":
            keep[sel] = cls == 0
        else:  # out
            keep[sel] = cls == -1
    return keep


# point-side refinement modes per predicate, when R=points S=areal
_PT_MODES_R = {"intersects": "in_or_on", "inside": "strict",
               "covered_by": "in_or_on", "meet": "on", "disjoint": "out"}
# when S=points R=areal (contains(R,S) == within(S,R) etc.)
_PT_MODES_S = {"intersects": "in_or_on", "contains": "strict",
               "covers": "in_or_on", "meet": "on", "disjoint": "out"}


def make_join_kernel(cfg: EngineConfig, grid: GridSpec, predicate: str,
                     hot_cells=None):
    """Build the map_groups kernel for a predicate join or find_relation."""
    hot = (np.asarray(hot_cells, dtype=np.int64)
           if hot_cells is not None and len(hot_cells) else None)
    find_rel = predicate == "find_relation"
    schema = REL_SCHEMA if find_rel else PAIR_SCHEMA

    def kernel(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        r_sel = np.nonzero(side == 0)[0]
        s_sel = np.nonzero(side == 1)[0]
        if len(r_sel) == 0 or len(s_sel) == 0:
            return schema.empty_table()
        cell_key = int(t["cell_id"][0].as_py())
        geo = geoms_from_table(t)
        ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
        rm = np.stack([minx[r_sel], miny[r_sel],
                       maxx[r_sel], maxy[r_sel]], axis=1)
        sm = np.stack([minx[s_sel], miny[s_sel],
                       maxx[s_sel], maxy[s_sel]], axis=1)
        ri, si = mbr_candidates(rm, sm, cell_key, grid, hot,
                                cfg.salt_factor, cfg.pair_chunk)
        if len(ri) == 0:
            return schema.empty_table()
        gri = r_sel[ri]       # global row indices in t
        gsi = s_sel[si]

        if find_rel:
            return _refine_find_relation(cfg, t, geo, gri, gsi, rm, sm,
                                         ri, si)

        if not cfg.refinement:
            keep = np.ones(len(gri), dtype=bool)
        else:
            keep = _refine_predicate(cfg, geo, gri, gsi, predicate)
        return pa.table({"r_id": ids[gri[keep]],
                         "s_id": ids[gsi[keep]]}, schema=PAIR_SCHEMA)

    kernel.__name__ = f"join_{predicate}"
    return kernel


def _refine_predicate(cfg, geo, gri, gsi, predicate):
    ids, gtypes, offs, vals, *_ = geo
    r_pts = (gtypes[gri] == GT_POINT).all()
    s_areal = np.isin(gtypes[gsi], _AREAL).all()
    s_pts = (gtypes[gsi] == GT_POINT).all()
    r_areal = np.isin(gtypes[gri], _AREAL).all()
    if r_pts and s_areal and predicate in _PT_MODES_R:
        return _refine_point_in_areal(gri, gsi, geo, geo,
                                      _PT_MODES_R[predicate])
    if s_pts and r_areal and predicate in _PT_MODES_S:
        return _refine_point_in_areal(gsi, gri, geo, geo,
                                      _PT_MODES_S[predicate])
    keep = np.zeros(len(gri), dtype=bool)
    for k in range(len(gri)):
        i, j = int(gri[k]), int(gsi[k])
        keep[k] = eval_predicate(predicate, int(gtypes[i]),
                                 _geom(offs, vals, i), int(gtypes[j]),
                                 _geom(offs, vals, j))
    return keep


def _refine_find_relation(cfg, t, geo, gri, gsi, rm, sm, ri, si):
    """FIND_RELATION: classify each candidate pair.

    Mirrors forwardPair (topology_join_filter.cpp:9-35): MBR_CROSS would be
    an immediate TR_INTERSECT but is unreachable (dead code upstream); with
    the intermediate filter off, every pair goes to specialized refinement.
    """
    ids, gtypes, offs, vals, *_ = geo
    mbr_cases = relate_mbrs_batch(rm[ri, 0], rm[ri, 1], rm[ri, 2], rm[ri, 3],
                                  sm[si, 0], sm[si, 1], sm[si, 2], sm[si, 3])
    rel = np.empty(len(gri), dtype=np.int8)
    if not cfg.refinement:
        rel[:] = TR_INTERSECT
    else:
        for k in range(len(gri)):
            if mbr_cases[k] == MBR_CROSS:    # parity: unreachable
                rel[k] = TR_INTERSECT
                continue
            i, j = int(gri[k]), int(gsi[k])
            rel[k] = find_relation(int(gtypes[i]), _geom(offs, vals, i),
                                   int(gtypes[j]), _geom(offs, vals, j),
                                   int(mbr_cases[k]))
    return pa.table({"r_id": ids[gri], "s_id": ids[gsi],
                     "relation": rel}, schema=REL_SCHEMA)
