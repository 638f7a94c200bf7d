"""Deterministic synthetic spatial layers (FIXTURES.md §2).

Every attribute of row *i* derives from ``splitmix64`` hashes of ``(seed, i,
salt)`` — fully vectorized, order-independent, identical regardless of how
rows are batched across Ray tasks.  Layers use the reference's TIGER-US
benchmark bounds by default (resources/config_cluster.ini, driver.cpp:9-11).

Geometry table schema (the engine's columnar form):
``id:int64, gtype:int8, coords:list<float64>, minx..maxy:float64``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import TIGER_US_BOUNDS
from ..geometry.core import GT_LINESTRING, GT_POINT, GT_POLYGON

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def rand01(idx: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) per (seed, idx, salt), vectorized."""
    with np.errstate(over="ignore"):
        key = (np.asarray(idx, dtype=np.uint64)
               * np.uint64(0x9E3779B97F4A7C15)) & _MASK
        key = key ^ (np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
                     * np.uint64(0xC2B2AE3D27D4EB4F) & _MASK)
        key = (key + np.uint64(salt) * np.uint64(0x165667B19E3779F9)) & _MASK
        h = _splitmix64(key)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _geom_table(ids, gtype, flat, offsets, minx, miny, maxx, maxy):
    coords = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.float64()))
    return pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "gtype": pa.array(np.full(len(ids), gtype, dtype=np.int8)),
        "coords": coords,
        "minx": pa.array(minx, type=pa.float64()),
        "miny": pa.array(miny, type=pa.float64()),
        "maxx": pa.array(maxx, type=pa.float64()),
        "maxy": pa.array(maxy, type=pa.float64()),
    })


def synth_points(ids: np.ndarray, seed: int,
                 bounds=TIGER_US_BOUNDS) -> pa.Table:
    """One point per id, uniform in bounds (the geotag layer)."""
    ids = np.asarray(ids, dtype=np.int64)
    x0, y0, x1, y1 = bounds
    x = x0 + rand01(ids, seed, 1) * (x1 - x0)
    y = y0 + rand01(ids, seed, 2) * (y1 - y0)
    flat = np.empty(2 * len(ids))
    flat[0::2] = x
    flat[1::2] = y
    offsets = np.arange(0, 2 * len(ids) + 1, 2, dtype=np.int32)
    return _geom_table(ids, GT_POINT, flat, offsets, x, y, x, y)


def synth_polygons(ids: np.ndarray, seed: int, bounds=TIGER_US_BOUNDS,
                   min_edge=0.05, max_edge=0.5,
                   min_v=5, max_v=64) -> pa.Table:
    """Star-shaped single-ring CCW polygons: random center, per-vertex
    jittered angles + radii (valid simple rings by construction)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    x0, y0, x1, y1 = bounds
    nv = (min_v + (rand01(ids, seed, 3)
                   * (max_v - min_v + 1)).astype(np.int64))
    cx = x0 + rand01(ids, seed, 4) * (x1 - x0)
    cy = y0 + rand01(ids, seed, 5) * (y1 - y0)
    hx = (min_edge + rand01(ids, seed, 6) * (max_edge - min_edge)) / 2.0
    hy = (min_edge + rand01(ids, seed, 7) * (max_edge - min_edge)) / 2.0
    kmax = int(nv.max()) if n else min_v
    k = np.arange(kmax)
    # per (row, vertex) randomness: salt mixes the vertex index
    jit = np.stack([rand01(ids, seed, 100 + 2 * kk) for kk in range(kmax)],
                   axis=1)
    rad = np.stack([rand01(ids, seed, 101 + 2 * kk) for kk in range(kmax)],
                   axis=1)
    theta = 2.0 * np.pi * (k[None, :] + 0.8 * jit) / nv[:, None]
    r = 0.35 + 0.65 * rad
    vx = cx[:, None] + hx[:, None] * r * np.cos(theta)
    vy = cy[:, None] + hy[:, None] * r * np.sin(theta)
    mask = k[None, :] < nv[:, None]
    flat = np.empty(2 * int(nv.sum()))
    flat[0::2] = vx[mask]
    flat[1::2] = vy[mask]
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(2 * nv, out=offsets[1:])
    vx_m = np.where(mask, vx, np.nan)
    vy_m = np.where(mask, vy, np.nan)
    return _geom_table(ids, GT_POLYGON, flat, offsets,
                       np.nanmin(vx_m, axis=1), np.nanmin(vy_m, axis=1),
                       np.nanmax(vx_m, axis=1), np.nanmax(vy_m, axis=1))


def synth_linestrings(ids: np.ndarray, seed: int, bounds=TIGER_US_BOUNDS,
                      min_v=2, max_v=20, step=0.05) -> pa.Table:
    """Random-walk open polylines."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    x0, y0, x1, y1 = bounds
    nv = (min_v + (rand01(ids, seed, 8)
                   * (max_v - min_v + 1)).astype(np.int64))
    kmax = int(nv.max()) if n else min_v
    sx = x0 + rand01(ids, seed, 9) * (x1 - x0)
    sy = y0 + rand01(ids, seed, 10) * (y1 - y0)
    dx = np.stack([rand01(ids, seed, 200 + 2 * kk) - 0.5
                   for kk in range(kmax)], axis=1) * 2 * step
    dy = np.stack([rand01(ids, seed, 201 + 2 * kk) - 0.5
                   for kk in range(kmax)], axis=1) * 2 * step
    vx = sx[:, None] + np.cumsum(dx, axis=1) - dx
    vy = sy[:, None] + np.cumsum(dy, axis=1) - dy
    k = np.arange(kmax)
    mask = k[None, :] < nv[:, None]
    flat = np.empty(2 * int(nv.sum()))
    flat[0::2] = vx[mask]
    flat[1::2] = vy[mask]
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(2 * nv, out=offsets[1:])
    vx_m = np.where(mask, vx, np.nan)
    vy_m = np.where(mask, vy, np.nan)
    return _geom_table(ids, GT_LINESTRING, flat, offsets,
                       np.nanmin(vx_m, axis=1), np.nanmin(vy_m, axis=1),
                       np.nanmax(vx_m, axis=1), np.nanmax(vy_m, axis=1))


def synth_boxes(ids: np.ndarray, seed: int, bounds=TIGER_US_BOUNDS,
                min_edge=0.05, max_edge=0.5) -> pa.Table:
    """Axis-aligned boxes (coords = [minx,miny,maxx,maxy])."""
    from ..geometry.core import GT_BOX
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    x0, y0, x1, y1 = bounds
    w = min_edge + rand01(ids, seed, 11) * (max_edge - min_edge)
    h = min_edge + rand01(ids, seed, 12) * (max_edge - min_edge)
    bx = x0 + rand01(ids, seed, 13) * (x1 - x0 - w)
    by = y0 + rand01(ids, seed, 14) * (y1 - y0 - h)
    flat = np.empty(4 * n)
    flat[0::4] = bx
    flat[1::4] = by
    flat[2::4] = bx + w
    flat[3::4] = by + h
    offsets = np.arange(0, 4 * n + 1, 4, dtype=np.int32)
    return _geom_table(ids, GT_BOX, flat, offsets, bx, by, bx + w, by + h)


_KINDS = {"points": synth_points, "polygons": synth_polygons,
          "linestrings": synth_linestrings, "boxes": synth_boxes}


def ray_layer(kind: str, n: int, seed: int, bounds=TIGER_US_BOUNDS,
              parallelism: int = -1, **kw):
    """Distributed deterministic layer: ray.data.range(n) -> map_batches.

    Row i's geometry depends only on (seed, i): the layer is identical for
    any parallelism/batching, so tests and oracles can regenerate it
    anywhere.
    """
    import ray.data as rd
    fn = _KINDS[kind]

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return fn(ids, seed, bounds=bounds, **kw)

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0
                  else None)
    return ds.map_batches(build, batch_format="pyarrow")


def table_layer(kind: str, n: int, seed: int, bounds=TIGER_US_BOUNDS,
                **kw) -> pa.Table:
    """Driver-side (small) layer for tests/oracles."""
    return _KINDS[kind](np.arange(n, dtype=np.int64), seed,
                        bounds=bounds, **kw)
