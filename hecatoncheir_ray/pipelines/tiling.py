"""Raster <-> vector tiling (north rule): assign geotagged rows to grid
tiles, compute polygon tile covers, per-tile manifests.

* vector -> tile: a point row maps to exactly one tile (``point_cell``);
  a polygon/box maps to every tile its MBR overlaps (``explode_cells`` —
  the same primitive the join shuffle uses, exposed as an API).
* raster -> vector: sources/images.PatchImages splits image rasters into
  patch grids; combining patch rows with the image's geotag tile gives the
  raster side of the mapping.

Tile ids are row-major fine-grid cells (grid.py), the Ray-native analog of
an H3/S2 index for the reference's uniform grids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import GridSpec
from ..grid import explode_cells, point_cell

TILE_SCHEMA = pa.schema([("id", pa.int64()), ("tile_id", pa.int64())])


def tile_assignments(points: Dataset, grid: GridSpec) -> Dataset:
    """Point geometry table -> (id, tile_id), one row per point."""

    def assign(t: pa.Table) -> pa.Table:
        x = t["minx"].to_numpy(zero_copy_only=False)
        y = t["miny"].to_numpy(zero_copy_only=False)
        return pa.table({"id": t["id"],
                         "tile_id": pa.array(point_cell(grid, x, y),
                                             type=pa.int64())},
                        schema=TILE_SCHEMA)

    return points.map_batches(assign, batch_format="pyarrow")


def tile_cover(geoms: Dataset, grid: GridSpec) -> Dataset:
    """Any geometry table -> (id, tile_id), one row per overlapped tile."""

    def cover(t: pa.Table) -> pa.Table:
        rows, cells = explode_cells(
            grid,
            t["minx"].to_numpy(zero_copy_only=False),
            t["miny"].to_numpy(zero_copy_only=False),
            t["maxx"].to_numpy(zero_copy_only=False),
            t["maxy"].to_numpy(zero_copy_only=False))
        ids = t["id"].to_numpy(zero_copy_only=False)[rows]
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "tile_id": pa.array(cells, pa.int64())},
                        schema=TILE_SCHEMA)

    return geoms.map_batches(cover, batch_format="pyarrow")


def tile_counts(assignments: Dataset, grid: GridSpec):
    """(id, tile_id) -> DataFrame(tile_id, n) for non-empty tiles.

    Per-batch SPARSE (tile, count) partials + one shuffle-side groupby
    Sum — partial size tracks the batch's distinct tiles (not ppd^2
    dense), and the driver only ever sees the non-empty result rows, so
    the same code holds at ppd 32 and ppd 4096.  The Sum merge is a
    hash-partitioned pandas reduce: tile cardinality reaches ppd^2 and
    Ray's sort-based aggregate pays ~0.3 ms coordination per group."""
    import pandas as pd

    from ..functions.idjoin import hash_group_reduce

    def partial(t: pa.Table) -> pa.Table:
        c = t["tile_id"].to_numpy(zero_copy_only=False)
        uc, cnt = np.unique(c, return_counts=True)
        return pa.table({"tile_id": pa.array(uc, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    out = hash_group_reduce(
        assignments.map_batches(partial, batch_format="pyarrow"),
        ["tile_id"], {"n": ("n", "sum")}, num_parts=64).to_pandas()
    out["tile_id"] = out["tile_id"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("tile_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# hierarchical tile pyramid (quadkey / Z-order — the H3/S2-style index)
# ---------------------------------------------------------------------------
# Bing-maps-style quadkeys over the dataspace: at zoom z the space is a
# 2^z x 2^z grid and a tile's key is the bit-interleave of (tx, ty); the
# key at zoom z-1 is the child key >> 2, so every coarser level derives
# from the max-zoom key by *integer shifts only*.  Float arithmetic
# touches exactly one expression (the max-zoom cell computation), written
# identically in numpy and SQL -> the whole pyramid is bit-exact
# SQL-checkable.  Public pattern: Bing tile system / Z-order curves.


def quadkey(x: np.ndarray, y: np.ndarray, bounds, zoom: int) -> np.ndarray:
    """Vectorized point -> zoom-level quadkey (int64 Z-order interleave)."""
    x0, y0, x1, y1 = bounds
    p = 1 << zoom
    tx = np.clip(np.floor((x - x0) / (x1 - x0) * p).astype(np.int64),
                 0, p - 1)
    ty = np.clip(np.floor((y - y0) / (y1 - y0) * p).astype(np.int64),
                 0, p - 1)
    qk = np.zeros(len(tx), dtype=np.int64)
    for b in range(zoom):
        qk |= ((tx >> b) & 1) << (2 * b)
        qk |= ((ty >> b) & 1) << (2 * b + 1)
    return qk


def quadkey_sql(x: str, y: str, bounds, zoom: int) -> str:
    """The SQL twin of :func:`quadkey` (same op order, same clamps)."""
    x0, y0, x1, y1 = bounds
    p = 1 << zoom
    tx = (f"LEAST(GREATEST(CAST(FLOOR((({x}) - ({x0!r})) / {x1 - x0!r} "
          f"* {p}) AS BIGINT), 0), {p - 1})")
    ty = (f"LEAST(GREATEST(CAST(FLOOR((({y}) - ({y0!r})) / {y1 - y0!r} "
          f"* {p}) AS BIGINT), 0), {p - 1})")
    terms = []
    for b in range(zoom):
        terms.append(f"(((tx >> {b}) & 1) << {2 * b})")
        terms.append(f"(((ty >> {b}) & 1) << {2 * b + 1})")
    return (f"(SELECT {' | '.join(terms)} "
            f"FROM (SELECT {tx} AS tx, {ty} AS ty))")


def pyramid_counts(points: Dataset, bounds, max_zoom: int) -> Dataset:
    """Point geometry table -> (zoom, qk, n) for every zoom 0..max_zoom.

    One pass: each batch computes max-zoom quadkeys, collapses them to
    per-batch (qk, count) partials, derives every coarser level by
    ``qk >> 2`` (integers only), and a single shuffle-side groupby-Sum
    (hash-partitioned pandas reduce — up to 4^max_zoom groups) merges
    partials — the driver never sees per-point rows."""
    from ..functions.idjoin import hash_group_reduce

    def partial(t: pa.Table) -> pa.Table:
        qk = quadkey(t["minx"].to_numpy(zero_copy_only=False),
                     t["miny"].to_numpy(zero_copy_only=False),
                     bounds, max_zoom)
        uq, cnt = np.unique(qk, return_counts=True)
        zs, qs, ns = [], [], []
        for z in range(max_zoom, -1, -1):
            zs.append(np.full(len(uq), z, dtype=np.int64))
            qs.append(uq)
            ns.append(cnt)
            if z:    # collapse children into parents for the next level
                parent = uq >> 2
                uq, inv = np.unique(parent, return_inverse=True)
                cnt = np.bincount(inv, weights=cnt).astype(np.int64)
        return pa.table({"zoom": pa.array(np.concatenate(zs)),
                         "qk": pa.array(np.concatenate(qs)),
                         "n": pa.array(np.concatenate(ns))})

    return hash_group_reduce(
        points.map_batches(partial, batch_format="pyarrow"),
        ["zoom", "qk"], {"n": ("n", "sum")}, num_parts=64)


def pyramid_counts_sql(x: str, y: str, from_clause: str, bounds,
                       max_zoom: int) -> str:
    """DuckDB twin of :func:`pyramid_counts`: max-zoom quadkey once, then
    shift per zoom level via generate_series."""
    qk = quadkey_sql(x, y, bounds, max_zoom)
    return f"""
        WITH q AS (SELECT {qk} AS qk {from_clause}),
        z AS (SELECT unnest(generate_series(0, {max_zoom})) AS zoom)
        SELECT z.zoom AS zoom,
               q.qk >> (2 * ({max_zoom} - z.zoom)) AS qk,
               COUNT(*) AS n
        FROM q CROSS JOIN z GROUP BY 1, 2"""


def image_tile_assignments(images: Dataset, grid: GridSpec,
                           seed: int = 42,
                           geotag: str = "split64") -> Dataset:
    """Image table -> (image_id, tile_id) via the deterministic geotag.

    ``geotag="split64"`` uses the flagship's splitmix64 geotag
    (sources/images.geotag_table); ``"u01"`` keys the small-modulus u01
    hash family on the image index instead — same uniform layout, but
    every step is DuckDB-expressible, so the assignment gets a bit-exact
    SQL oracle (wraparound uint64 multiplies are not)."""
    from ..sources.images import geotag_table

    def assign(t: pa.Table) -> pa.Table:
        if geotag == "u01":
            from ..sources.derive import points_np
            ids = np.array([int(s[3:]) for s in
                            t["image_id"].to_pylist()], dtype=np.int64)
            x, y = points_np(ids)
        else:
            g = geotag_table(t, seed)
            x = g["minx"].to_numpy(zero_copy_only=False)
            y = g["miny"].to_numpy(zero_copy_only=False)
        return pa.table({
            "image_id": t["image_id"],
            "tile_id": pa.array(point_cell(grid, x, y), type=pa.int64()),
        })

    return images.map_batches(assign, batch_format="pyarrow")
