"""Exact distributed kNN JOIN over point layers: every R row gets its k
nearest S rows (ties by (dist2, s_id)).

The reference has batch kNN for a *list* of query points
(src/UniformGrid/knn_filter.cpp) — a kNN join treats the whole R layer as
queries, so broadcasting R is O(|R|·|S|) and non-distributed.  This is the
scale shape instead (the cell-ring idea turned into shuffles):

1. **Local pass** — co-partition R and S by grid cell (one shuffle).  Per
   cell, each R point takes its top-k among the cell's own S points.  If
   the kth local distance is smaller than the point's distance to its cell
   boundary, no point outside the cell can beat it — the local answer is
   provably global and is emitted.  (reference's distanceToPartition bound,
   knn_filter.cpp, applied in reverse.)
2. **Expansion pass** — unresolved R points re-shuffle, each replicated to
   the cells overlapped by the disk of its proven radius (the kth local
   distance: the true kNN must lie inside that disk).  Per cell, every S
   point within the radius is emitted as a candidate — a pair appears
   exactly once because S sits only in its home cell.
3. R points with fewer than k S points in their own cell have no proven
   radius; they loop through pass 2 with a doubling radius (cell diagonal,
   2x per round) until k are inside the radius.  With cells auto-sized to
   hold >> k points this remainder is a boundary-effect minority.
4. **Merge** — one result-sized groupby(r_id) keeps the k smallest
   (dist2, s_id) per point.

Everything shuffled is (id, x, y[, r2]) — never payload columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..config import EngineConfig
from ..grid import point_cell
from ..stages.assign import hash_cells_to_parts

_PT_SCHEMA = pa.schema([("pid", pa.int64()), ("x", pa.float64()),
                        ("y", pa.float64()), ("side", pa.int8()),
                        ("r2", pa.float64()), ("cell", pa.int64()),
                        ("part", pa.int32())])
_CAND_SCHEMA = pa.schema([("r_id", pa.int64()), ("s_id", pa.int64()),
                          ("dist2", pa.float64())])
_UNRES_SCHEMA = pa.schema([("pid", pa.int64()), ("x", pa.float64()),
                           ("y", pa.float64()), ("r2", pa.float64())])


def _pt_rows(t: pa.Table):
    ids = t["id"].to_numpy(zero_copy_only=False)
    x = t["minx"].to_numpy(zero_copy_only=False)
    y = t["miny"].to_numpy(zero_copy_only=False)
    return ids, x, y


def _assign_points(ds: Dataset, grid, side: int, parts: int) -> Dataset:
    def assign(t: pa.Table) -> pa.Table:
        ids, x, y = _pt_rows(t)
        cell = point_cell(grid, x, y)
        return pa.table({
            "pid": pa.array(ids), "x": pa.array(x), "y": pa.array(y),
            "side": pa.array(np.full(len(ids), side, np.int8)),
            "r2": pa.array(np.full(len(ids), np.nan)),
            "cell": pa.array(cell),
            "part": pa.array(hash_cells_to_parts(cell, parts))},
            schema=_PT_SCHEMA)

    return ds.map_batches(assign, batch_format="pyarrow")


def _explode_disks(u: Dataset, grid, parts: int) -> Dataset:
    """Unresolved (pid, x, y, r2) -> one row per cell the disk's bounding
    square overlaps (side=0)."""
    from ..grid import explode_cells

    def explode(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        r2 = t["r2"].to_numpy(zero_copy_only=False)
        r = np.sqrt(r2)
        rows, cells = explode_cells(grid, x - r, y - r, x + r, y + r)
        return pa.table({
            "pid": pa.array(pid[rows]), "x": pa.array(x[rows]),
            "y": pa.array(y[rows]),
            "side": pa.array(np.zeros(len(rows), np.int8)),
            "r2": pa.array(r2[rows]), "cell": pa.array(cells),
            "part": pa.array(hash_cells_to_parts(cells, parts))},
            schema=_PT_SCHEMA)

    return u.map_batches(explode, batch_format="pyarrow")


def _cell_segments(cell: np.ndarray):
    order = np.argsort(cell, kind="stable")
    sc = cell[order]
    cuts = np.nonzero(np.diff(sc))[0] + 1
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [len(sc)]])
    return order, sc, starts, ends


def _make_local_kernel(grid, k: int, chunk: int):
    """Pass-1 kernel: emits result rows for boundary-resolved points and
    (pid, x, y, r2) rows for the rest (s_id == -1 marks those)."""

    def kernel(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        out_r, out_s, out_d = [], [], []
        un_id, un_x, un_y, un_r2 = [], [], [], []
        if len(cell) == 0:
            starts = ends = np.zeros(0, np.int64)
            order = sc = np.zeros(0, np.int64)
        else:
            order, sc, starts, ends = _cell_segments(cell)
        for a, b in zip(starts.tolist(), ends.tolist()):
            idx = order[a:b]
            c = int(sc[a])
            ri = idx[side[idx] == 0]
            si = idx[side[idx] == 1]
            if len(ri) == 0:
                continue
            cx = c % grid.ppd
            cy = c // grid.ppd
            x0 = grid.minx + cx * grid.cell_w
            y0 = grid.miny + cy * grid.cell_h
            bnd = np.minimum.reduce([x[ri] - x0, x0 + grid.cell_w - x[ri],
                                     y[ri] - y0, y0 + grid.cell_h - y[ri]])
            bnd = np.maximum(bnd, 0.0)
            b2 = bnd * bnd
            if len(si) < k:
                un_id.append(pid[ri])
                un_x.append(x[ri])
                un_y.append(y[ri])
                un_r2.append(np.full(len(ri), np.nan))
                continue
            sx, sy, sid = x[si], y[si], pid[si]
            step = max(1, chunk // max(len(si), 1))
            for lo in range(0, len(ri), step):
                hi = min(lo + step, len(ri))
                rr = ri[lo:hi]
                dx = x[rr][:, None] - sx[None, :]
                dy = y[rr][:, None] - sy[None, :]
                d2 = dx * dx + dy * dy
                sel = np.argpartition(d2, k - 1, axis=1)[:, :k]
                d2k_all = np.take_along_axis(d2, sel, axis=1)
                kth = d2k_all.max(axis=1)
                res = kth < b2[lo:hi]
                if res.any():
                    rs = np.nonzero(res)[0]
                    # rank each resolved row's k hits by (dist2, s_id):
                    # stable argsort by dist2 after a pre-sort by s_id
                    sid_sel = sid[sel[rs]]
                    d2_sel = d2k_all[rs]
                    o1 = np.argsort(sid_sel, axis=1, kind="stable")
                    d2o = np.take_along_axis(d2_sel, o1, axis=1)
                    o2 = np.argsort(d2o, axis=1, kind="stable")
                    fo = np.take_along_axis(o1, o2, axis=1)
                    out_r.append(np.repeat(pid[rr[rs]], k))
                    out_s.append(np.take_along_axis(sid_sel, fo,
                                                    axis=1).ravel())
                    out_d.append(np.tile(
                        np.arange(1, k + 1, dtype=np.float64), len(rs)))
                if (~res).any():
                    us = np.nonzero(~res)[0]
                    un_id.append(pid[rr[us]])
                    un_x.append(x[rr[us]])
                    un_y.append(y[rr[us]])
                    un_r2.append(kth[us])
        r_ids = (np.concatenate(out_r) if out_r
                 else np.zeros(0, np.int64))
        rows = pa.table({
            "r_id": pa.array(r_ids),
            "s_id": pa.array(np.concatenate(out_s) if out_s
                             else np.zeros(0, np.int64)),
            "dist2": pa.array(np.concatenate(out_d) if out_d
                              else np.zeros(0))}, schema=_CAND_SCHEMA)
        un = pa.table({
            "pid": pa.array(np.concatenate(un_id) if un_id
                            else np.zeros(0, np.int64)),
            "x": pa.array(np.concatenate(un_x) if un_x else np.zeros(0)),
            "y": pa.array(np.concatenate(un_y) if un_y else np.zeros(0)),
            "r2": pa.array(np.concatenate(un_r2) if un_r2
                           else np.zeros(0))}, schema=_UNRES_SCHEMA)
        # single output table: result rows + marker rows (s_id = -1)
        marker = pa.table({
            "r_id": un["pid"], "s_id": pa.array(
                np.full(len(un), -1, np.int64)), "dist2": un["r2"]},
            schema=_CAND_SCHEMA)
        return pa.concat_tables([
            rows.append_column("ux", pa.array(np.full(len(rows), np.nan)))
                .append_column("uy", pa.array(np.full(len(rows), np.nan))),
            marker.append_column("ux", un["x"]).append_column("uy",
                                                              un["y"])])

    return kernel


def _make_range_kernel(chunk: int):
    """Pass-2 kernel: disk rows (side 0, r2) x S rows -> candidate pairs
    with dist2 <= r2."""

    def kernel(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        r2 = t["r2"].to_numpy(zero_copy_only=False)
        out_r, out_s, out_d = [], [], []
        if len(cell) == 0:
            starts = ends = np.zeros(0, np.int64)
            order = sc = np.zeros(0, np.int64)
        else:
            order, sc, starts, ends = _cell_segments(cell)
        for a, b in zip(starts.tolist(), ends.tolist()):
            idx = order[a:b]
            ri = idx[side[idx] == 0]
            si = idx[side[idx] == 1]
            if len(ri) == 0 or len(si) == 0:
                continue
            sx, sy, sid = x[si], y[si], pid[si]
            step = max(1, chunk // max(len(si), 1))
            for lo in range(0, len(ri), step):
                hi = min(lo + step, len(ri))
                rr = ri[lo:hi]
                dx = x[rr][:, None] - sx[None, :]
                dy = y[rr][:, None] - sy[None, :]
                d2 = dx * dx + dy * dy
                ii, jj = np.nonzero(d2 <= r2[rr][:, None])
                if len(ii):
                    out_r.append(pid[rr[ii]])
                    out_s.append(sid[jj])
                    out_d.append(d2[ii, jj])
        return pa.table({
            "r_id": pa.array(np.concatenate(out_r) if out_r
                             else np.zeros(0, np.int64)),
            "s_id": pa.array(np.concatenate(out_s) if out_s
                             else np.zeros(0, np.int64)),
            "dist2": pa.array(np.concatenate(out_d) if out_d
                              else np.zeros(0))}, schema=_CAND_SCHEMA)

    return kernel


def knn_join(r: Dataset, s: Dataset, k: int,
             cfg: EngineConfig | None = None,
             max_rounds: int = 8) -> Dataset:
    """-> Dataset(r_id, s_id, rank), k rows per R point, rank 1..k ordered
    by (dist2, s_id).  Point layers only."""
    from .spatial_join import compute_dataspace
    cfg = cfg or EngineConfig()
    bounds = cfg.dataspace or compute_dataspace(r, s)
    grid = cfg.make_grid(bounds)
    parts = cfg.shuffle_parts
    chunk = cfg.pair_chunk

    ra = _assign_points(r, grid, 0, parts)
    sa = _assign_points(s, grid, 1, parts).materialize()

    import pyarrow.compute as pc

    pass1 = ra.union(sa).groupby("part") \
        .map_groups(_make_local_kernel(grid, k, chunk),
                    batch_format="pyarrow").materialize()

    def keep_resolved(t: pa.Table) -> pa.Table:
        m = t.filter(pc.greater_equal(t["s_id"], 0))
        return pa.table({
            "r_id": m["r_id"], "s_id": m["s_id"],
            "rank": pa.array(m["dist2"].to_numpy(
                zero_copy_only=False).astype(np.int64))})

    resolved = pass1.map_batches(keep_resolved, batch_format="pyarrow")

    def to_unres(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["s_id"], -1))
        return pa.table({"pid": m["r_id"], "x": m["ux"], "y": m["uy"],
                         "r2": m["dist2"]}, schema=_UNRES_SCHEMA)

    unres = pass1.map_batches(to_unres, batch_format="pyarrow") \
        .materialize()

    def split_nan(want_nan: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.is_nan(t["r2"])
            return t.filter(m if want_nan else pc.invert(m))
        return fn

    known = unres.map_batches(split_nan(False), batch_format="pyarrow")
    unknown = unres.map_batches(split_nan(True), batch_format="pyarrow") \
        .materialize()

    def range_pass(u: Dataset) -> Dataset:
        return _explode_disks(u, grid, parts).union(sa) \
            .groupby("part").map_groups(_make_range_kernel(chunk),
                                        batch_format="pyarrow")

    cand_sets = []
    if known.count() > 0:
        cand_sets.append(range_pass(known))

    # radius-less points (fewer than k S in their own cell) loop with a
    # doubling disk until k fall inside; candidates from too-small guesses
    # are a subset of the final round's and collapse in the merge dedup.
    # Settle detection is shuffle-side: per-r_id candidate counts filter
    # to the settled ids, which anti-join against ``unknown`` in one
    # hash-partitioned groupby (functions/idjoin.filter_by_ids) — the
    # driver touches only scalar counts per round (the settled minority
    # is O(|R|) in sparse regions, too big to round-trip).
    guess = grid.cell_w * grid.cell_w + grid.cell_h * grid.cell_h
    for _ in range(max_rounds):
        if unknown.count() == 0:
            break
        g = float(guess)

        def with_guess(t: pa.Table, _g=g) -> pa.Table:
            return t.set_column(t.schema.get_field_index("r2"), "r2",
                                pa.array(np.full(len(t), _g)))

        cand = range_pass(unknown.map_batches(
            with_guess, batch_format="pyarrow")).materialize()
        cand_sets.append(cand)

        def to_settled(t: pa.Table, _k=k) -> pa.Table:
            cnt = [c for c in t.column_names if c != "r_id"][0]
            m = t.filter(pc.greater_equal(t[cnt], _k))
            return pa.table({"r_id": m["r_id"]})

        settled = cand.groupby("r_id").count() \
            .map_batches(to_settled, batch_format="pyarrow").materialize()
        if settled.count() > 0:
            from ..functions.idjoin import filter_by_ids
            unknown = filter_by_ids(unknown, "pid", settled, "r_id",
                                    keep=False, num_parts=parts) \
                .materialize()
        guess *= 4.0
    else:
        if unknown.count() > 0:
            raise RuntimeError("knn_join: radius expansion did not "
                               "converge")

    if not cand_sets:
        return resolved                 # everything boundary-resolved

    all_cand = cand_sets[0]
    for c in cand_sets[1:]:
        all_cand = all_cand.union(c)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["s_id"]).sort_values(["dist2", "s_id"]) \
            .head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["r_id", "s_id", "rank"]]

    # only the expansion-pass minority pays the result-sized merge; the
    # boundary-resolved majority was ranked inside the pass-1 kernel
    merged = all_cand.groupby("r_id").map_groups(topk,
                                                 batch_format="pandas")
    return resolved.union(merged)
