"""Grid-cell math: MBR -> cell assignment, reference-point dedup.

Reference: getPartitionsForMBR
(/root/reference/Hecatoncheir/src/env/partitioning.cpp:14-38) computes the
range of coarse cells an MBR overlaps; objects are replicated to every
overlapped cell.  Duplicate results are avoided structurally; here we use the
canonical PBSM *reference-point rule* (equivalent result set to the
reference's class A/B/C/D scheme, see SURVEY.md §7.4): a candidate pair is
evaluated only in the cell that contains the point
``(max(r.minx, s.minx), max(r.miny, s.miny))``.

All functions are vectorized over row batches (no per-row Python in hot
paths).
"""

from __future__ import annotations

import numpy as np

from .config import GridSpec


def cell_range(grid: GridSpec, minx, miny, maxx, maxy):
    """Vectorized MBR -> inclusive cell index ranges (x0, y0, x1, y1)."""
    cw, ch = grid.cell_w, grid.cell_h
    x0 = np.clip(((minx - grid.minx) / cw).astype(np.int64), 0, grid.ppd - 1)
    y0 = np.clip(((miny - grid.miny) / ch).astype(np.int64), 0, grid.ppd - 1)
    x1 = np.clip(((maxx - grid.minx) / cw).astype(np.int64), 0, grid.ppd - 1)
    y1 = np.clip(((maxy - grid.miny) / ch).astype(np.int64), 0, grid.ppd - 1)
    return x0, y0, x1, y1


def point_cell(grid: GridSpec, x, y):
    """Vectorized point -> cell id (the cell containing the point)."""
    cx = np.clip(((x - grid.minx) / grid.cell_w).astype(np.int64),
                 0, grid.ppd - 1)
    cy = np.clip(((y - grid.miny) / grid.cell_h).astype(np.int64),
                 0, grid.ppd - 1)
    return cy * grid.ppd + cx


def explode_cells(grid: GridSpec, minx, miny, maxx, maxy):
    """Vectorized replication: for each row i, every overlapped cell.

    Returns (row_idx, cell_id) int64 arrays, one entry per (row, cell).
    Pure numpy (ragged arange via cumsum) — no Python loop.
    """
    x0, y0, x1, y1 = cell_range(grid, minx, miny, maxx, maxy)
    nx = (x1 - x0 + 1)
    ny = (y1 - y0 + 1)
    counts = nx * ny
    total = int(counts.sum())
    if total == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # ragged arange 0..counts[i]-1
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nxr = nx[row_idx]
    dx = local % nxr
    dy = local // nxr
    cell = (y0[row_idx] + dy) * grid.ppd + (x0[row_idx] + dx)
    return row_idx, cell


def ref_point_key(grid: GridSpec, rx, ry,
                  hot_cells: np.ndarray | None, salt_factor: int):
    """Shuffle key that *owns* a reference point (PBSM dedup).

    Without salting this is ``point_cell``.  With salting, points landing in
    a hot cell get the salted sub-cell key instead.  A candidate pair is kept
    only in the group whose key equals ``ref_point_key(max-min-corner)`` —
    exactly one group per pair, because (sub-)cells partition the plane.
    """
    cell = point_cell(grid, rx, ry)
    if hot_cells is None or len(hot_cells) == 0:
        return cell
    hot = _is_hot(cell, hot_cells)
    if not hot.any():
        return cell
    f = salt_factor
    cx = cell % grid.ppd
    cy = cell // grid.ppd
    ox = grid.minx + cx * grid.cell_w
    oy = grid.miny + cy * grid.cell_h
    sx = np.clip(((np.asarray(rx) - ox) / (grid.cell_w / f)).astype(np.int64),
                 0, f - 1)
    sy = np.clip(((np.asarray(ry) - oy) / (grid.cell_h / f)).astype(np.int64),
                 0, f - 1)
    out = cell.copy()
    out[hot] = _salt_key(grid, cell[hot], (sy * f + sx)[hot], f)
    return out


def _salt_key(grid: GridSpec, cell, sub, f: int):
    return grid.ppd * grid.ppd + cell * (f * f) + sub


_H_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    """splitmix64-style id hash for salt-bucket selection (int64 out)."""
    with np.errstate(over="ignore"):
        x = (ids.astype(np.uint64)
             + np.uint64(0x9E3779B97F4A7C15)) & _H_MASK
        x = ((x ^ (x >> np.uint64(30)))
             * np.uint64(0xBF58476D1CE4E5B9)) & _H_MASK
        x = ((x ^ (x >> np.uint64(27)))
             * np.uint64(0x94D049BB133111EB)) & _H_MASK
        x = x ^ (x >> np.uint64(31))
    return (x >> np.uint64(1)).astype(np.int64)


def explode_cells_hash_salted(grid: GridSpec, minx, miny, maxx, maxy,
                              ids: np.ndarray, side: int,
                              hot_cells: np.ndarray | None, f: int):
    """Hash-salting skew strategy (the north rule's *salting* leg; the
    geometric :func:`explode_cells_salted` is its *adaptive cell
    splitting* leg).

    A hot cell becomes an f x f bucket grid: R rows (side 0) land in the
    bucket ROW ``hash(id) % f`` (replicated across all f columns), S rows
    (side 1) in the bucket COLUMN ``hash(id) % f`` (replicated across all
    f rows).  Any (r, s) pair co-occurs in exactly ONE bucket
    ``(h_r % f, h_s % f)`` — exactly-once without any geometric test, so
    it caps group size even when every row has an IDENTICAL MBR
    (degenerate stacking, where sub-cell splitting cannot separate
    anything).  Cost: f replicas per hot-cell row on both sides; group
    size drops to |R|/f + |S|/f.
    """
    row_idx, cell = explode_cells(grid, minx, miny, maxx, maxy)
    if hot_cells is None or len(hot_cells) == 0:
        return row_idx, cell
    hot = _is_hot(cell, hot_cells)
    if not hot.any():
        return row_idx, cell
    keep_rows, keep_cells = row_idx[~hot], cell[~hot]
    hrow, hcell = row_idx[hot], cell[hot]
    h = _hash_ids(np.asarray(ids)[hrow]) % f
    rep = np.repeat(np.arange(len(hrow), dtype=np.int64), f)
    other = np.tile(np.arange(f, dtype=np.int64), len(hrow))
    if side == 0:
        sub = h[rep] * f + other          # fixed row, all columns
    else:
        sub = other * f + h[rep]          # all rows, fixed column
    salted = _salt_key(grid, hcell[rep], sub, f)
    return (np.concatenate([keep_rows, hrow[rep]]),
            np.concatenate([keep_cells, salted]))


def _is_hot(cell, hot_cells: np.ndarray):
    """Membership of cell ids in the sorted hot_cells array (vectorized)."""
    pos = np.searchsorted(hot_cells, cell)
    pos = np.clip(pos, 0, len(hot_cells) - 1)
    return hot_cells[pos] == cell


def explode_cells_salted(grid: GridSpec, minx, miny, maxx, maxy,
                         hot_cells: np.ndarray | None, salt_factor: int):
    """Like :func:`explode_cells` but hot cells are refined: a row overlapping
    a hot cell is replicated to the salt_factor^2 sub-cells its MBR overlaps
    (keys beyond ppd^2), capping any single shuffle group's size.
    """
    row_idx, cell = explode_cells(grid, minx, miny, maxx, maxy)
    if hot_cells is None or len(hot_cells) == 0:
        return row_idx, cell
    hot = _is_hot(cell, hot_cells)
    if not hot.any():
        return row_idx, cell
    keep_rows, keep_cells = row_idx[~hot], cell[~hot]
    hrow, hcell = row_idx[hot], cell[hot]
    f = salt_factor
    # sub-grid ranges of each row's MBR clipped to its hot cell
    cx = hcell % grid.ppd
    cy = hcell // grid.ppd
    ox = grid.minx + cx * grid.cell_w
    oy = grid.miny + cy * grid.cell_h
    sw, sh = grid.cell_w / f, grid.cell_h / f
    sx0 = np.clip(((np.asarray(minx)[hrow] - ox) / sw).astype(np.int64), 0, f - 1)
    sy0 = np.clip(((np.asarray(miny)[hrow] - oy) / sh).astype(np.int64), 0, f - 1)
    sx1 = np.clip(((np.asarray(maxx)[hrow] - ox) / sw).astype(np.int64), 0, f - 1)
    sy1 = np.clip(((np.asarray(maxy)[hrow] - oy) / sh).astype(np.int64), 0, f - 1)
    nx = sx1 - sx0 + 1
    ny = sy1 - sy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    rep = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nxr = nx[rep]
    dx = local % nxr
    dy = local // nxr
    sub = (sy0[rep] + dy) * f + (sx0[rep] + dx)
    salted = _salt_key(grid, hcell[rep], sub, f)
    return (np.concatenate([keep_rows, hrow[rep]]),
            np.concatenate([keep_cells, salted]))
