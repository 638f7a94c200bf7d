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

    Per-batch bincount partials merged on the driver (<= ppd^2 ints;
    a ray groupby shuffle would cost a barrier for a tiny result)."""
    import pandas as pd
    ncell = grid.ppd * grid.ppd

    def partial(t: pa.Table) -> pa.Table:
        c = t["tile_id"].to_numpy(zero_copy_only=False)
        h = np.bincount(c, minlength=ncell).astype(np.int64)
        return pa.table({"h": pa.array([h])})

    total = np.zeros(ncell, dtype=np.int64)
    for r in assignments.map_batches(partial,
                                     batch_format="pyarrow").take_all():
        total += np.asarray(r["h"])
    nz = np.nonzero(total)[0]
    return pd.DataFrame({"tile_id": nz.astype(np.int64), "n": total[nz]})


def image_tile_assignments(images: Dataset, grid: GridSpec,
                           seed: int = 42) -> Dataset:
    """Image table -> (image_id, tile_id) via the deterministic geotag."""
    from ..sources.images import geotag_table
    from ..sources.synth import rand01
    from ..config import TIGER_US_BOUNDS

    def assign(t: pa.Table) -> pa.Table:
        g = geotag_table(t, seed)
        x = g["minx"].to_numpy(zero_copy_only=False)
        y = g["miny"].to_numpy(zero_copy_only=False)
        return pa.table({
            "image_id": t["image_id"],
            "tile_id": pa.array(point_cell(grid, x, y), type=pa.int64()),
        })

    return images.map_batches(assign, batch_format="pyarrow")
