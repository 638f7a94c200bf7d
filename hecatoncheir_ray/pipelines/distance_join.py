"""Distance (epsilon) join: pairs with euclidean distance <= d.

Reference: the uniform-grid DJ filter + 3-phase MPI border exchange
(/root/reference/Hecatoncheir/src/UniformGrid/dj_filter.cpp:30-243,
src/env/comm_worker.cpp:315-450).  Under Ray Data the exchange vanishes
(SURVEY §3 EP3): R is cell-assigned with d-dilated MBRs, so the groupby
shuffle already co-locates every candidate; the per-cell kernel tests
``dist^2 <= d^2`` fully vectorized.  Comparison is inclusive
(dj_filter.cpp:80).

Dedup: the generic reference-point rule over (dilated-R, S) MBRs — for
point S this degenerates to "emit in S's own cell", each pair exactly once.

Beyond the reference (its DJ is points-only, dj_filter.cpp:30): the kernel
also handles point/linestring/polygon mixes — dist(A,B) <= d iff the pair
intersects (solid polygons) or some vertex of one side lies within d of a
segment of the other, both tested mega-batched (sweep._vertex_seg_leq_batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import EngineConfig, GridSpec
from ..geometry.core import GT_BOX, GT_POINT
from ..stages.assign import GEOM_COLS, geoms_from_table, make_assign_fn
from ..stages.sweep import PAIR_SCHEMA, generate_candidates
from .spatial_join import compute_dataspace


def make_distance_kernel(cfg: EngineConfig, grid: GridSpec, d: float,
                         hot_cells=None):
    hot = (np.asarray(hot_cells, dtype=np.int64)
           if hot_cells is not None and len(hot_cells) else None)
    d2 = d * d

    def kernel(t: pa.Table) -> pa.Table:
        geo = geoms_from_table(t)
        ids, gtypes, offs, vals, *_ = geo
        gri, gsi = generate_candidates(t, geo, grid, hot, cfg)
        if len(gri) == 0:
            return PAIR_SCHEMA.empty_table()
        if ((gtypes[gri] == GT_POINT).all()
                and (gtypes[gsi] == GT_POINT).all()):
            # fast path: the reference's uniform-grid DJ (points only,
            # dj_filter.cpp) — plain vectorized distance
            dx = vals[offs[gri]] - vals[offs[gsi]]
            dy = vals[offs[gri] + 1] - vals[offs[gsi] + 1]
            keep = (dx * dx + dy * dy) <= d2
            return pa.table({"r_id": ids[gri[keep]],
                             "s_id": ids[gsi[keep]]}, schema=PAIR_SCHEMA)
        if (gtypes == GT_BOX).any():
            raise NotImplementedError(
                "distance join over GT_BOX rows is not supported; convert "
                "boxes to polygons (reference parity: its DJ is points-"
                "only, dj_filter.cpp:30)")
        # general geometries (beyond the reference, VERDICT r1 missing #6):
        # dist <= d  iff  intersects (solid polygons)  OR  some vertex of
        # one side is within d of a segment of the other (disjoint segment
        # sets attain their min distance at a vertex).  The R-side MBR
        # columns are eps-dilated for assignment -- recompute true MBRs
        # from the coords for the geometric tests.
        from ..stages.sweep import _vertex_seg_leq_batch, refine_mask
        xs = vals[0::2]
        ys = vals[1::2]
        voff = (offs // 2).astype(np.int64)
        tminx = np.minimum.reduceat(xs, voff[:-1])
        tmaxx = np.maximum.reduceat(xs, voff[:-1])
        tminy = np.minimum.reduceat(ys, voff[:-1])
        tmaxy = np.maximum.reduceat(ys, voff[:-1])
        geo2 = (ids, gtypes, offs, vals, tminx, tminy, tmaxx, tmaxy)
        keep = refine_mask(cfg, geo2, gri, gsi, "intersects")
        und = np.nonzero(~keep)[0]
        if len(und):
            keep[und] = _vertex_seg_leq_batch(geo2, gri[und], gsi[und], d)
        return pa.table({"r_id": ids[gri[keep]], "s_id": ids[gsi[keep]]},
                        schema=PAIR_SCHEMA)

    kernel.__name__ = "distance_join"
    return kernel


def distance_join(r: Dataset, s: Dataset, d: float,
                  cfg: EngineConfig | None = None,
                  hot_cells: np.ndarray | None = None) -> Dataset:
    """Pairs (r_id, s_id) with euclidean distance <= d (point datasets)."""
    cfg = cfg or EngineConfig()
    bounds = cfg.dataspace or compute_dataspace(r, s)
    grid = cfg.make_grid(bounds)
    r2 = r.select_columns(GEOM_COLS).map_batches(
        make_assign_fn(grid, 0, hot_cells, cfg.salt_factor, eps=d,
                       skew_strategy=cfg.skew_strategy,
                       shuffle_parts=cfg.shuffle_parts),
        batch_format="pyarrow", batch_size=cfg.assign_batch_size)
    s2 = s.select_columns(GEOM_COLS).map_batches(
        make_assign_fn(grid, 1, hot_cells, cfg.salt_factor,
                       skew_strategy=cfg.skew_strategy,
                       shuffle_parts=cfg.shuffle_parts),
        batch_format="pyarrow", batch_size=cfg.assign_batch_size)
    both = r2.union(s2)
    kernel = make_distance_kernel(cfg, grid, d, hot_cells)
    return both.groupby("part").map_groups(kernel, batch_format="pyarrow")
