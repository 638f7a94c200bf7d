"""Cell-assignment stage: replicate each row to every grid cell its MBR
overlaps (optionally eps-dilated for distance joins, optionally salted for
hot cells).

Reference equivalent: the host's partitioning loop
(/root/reference/Hecatoncheir/src/env/partitioning.cpp:14-38, 72-115) that
routes objects to owner nodes by coarse cell — here it is a stateless
``map_batches`` transform producing a ``cell_id`` column; the groupby shuffle
replaces MPI batch shipping.

Zero-copy discipline: operates on ``batch_format="pyarrow"`` tables; the
explode is a single ``Table.take`` (gathers the list column without Python
iteration) plus two appended columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import GridSpec
from ..grid import (explode_cells, explode_cells_hash_salted,
                    explode_cells_salted)

GEOM_COLS = ["id", "gtype", "coords", "minx", "miny", "maxx", "maxy"]


def hash_cells_to_parts(cells: np.ndarray, parts: int) -> np.ndarray:
    """Spread (spatially adjacent) cell ids across shuffle partitions."""
    with np.errstate(over="ignore"):
        h = (cells.astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (h % np.uint64(parts)).astype(np.int32)


def make_assign_fn(grid: GridSpec, side: int,
                   hot_cells: np.ndarray | None = None,
                   salt_factor: int = 4,
                   eps: float = 0.0,
                   keep_cols: list[str] | None = None,
                   shuffle_parts: int = 256,
                   skew_strategy: str = "split"):
    """Build the map_batches fn.  ``side``: 0 = R, 1 = S.  ``eps`` dilates
    MBRs before assignment (distance join, SURVEY §3 EP3 — replaces the
    reference's 3-phase MPI border exchange).  Emits ``cell_id`` (fine grid
    key, dedup granularity) and ``part`` (hashed coarse shuffle key)."""
    hot = (np.asarray(hot_cells, dtype=np.int64)
           if hot_cells is not None and len(hot_cells) else None)
    cols = keep_cols or GEOM_COLS

    def assign(batch: pa.Table) -> pa.Table:
        minx = batch["minx"].to_numpy(zero_copy_only=False)
        miny = batch["miny"].to_numpy(zero_copy_only=False)
        maxx = batch["maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["maxy"].to_numpy(zero_copy_only=False)
        if eps:
            # dilated MBRs (distance join): used for explode AND written back
            # so the per-cell kernel's overlap test sees the dilation
            minx = minx - eps
            miny = miny - eps
            maxx = maxx + eps
            maxy = maxy + eps
            batch = batch.drop_columns(["minx", "miny", "maxx", "maxy"])
            batch = batch.append_column("minx", pa.array(minx))
            batch = batch.append_column("miny", pa.array(miny))
            batch = batch.append_column("maxx", pa.array(maxx))
            batch = batch.append_column("maxy", pa.array(maxy))
        if hot is None:
            rows, cells = explode_cells(grid, minx, miny, maxx, maxy)
        elif skew_strategy == "salt":
            rows, cells = explode_cells_hash_salted(
                grid, minx, miny, maxx, maxy,
                batch["id"].to_numpy(zero_copy_only=False), side,
                hot, salt_factor)
        else:
            rows, cells = explode_cells_salted(grid, minx, miny, maxx, maxy,
                                               hot, salt_factor)
        out = batch.select(cols).take(pa.array(rows))
        out = out.append_column("cell_id", pa.array(cells, type=pa.int64()))
        out = out.append_column(
            "part", pa.array(hash_cells_to_parts(cells, shuffle_parts)))
        out = out.append_column(
            "side", pa.array(np.full(len(cells), side, dtype=np.int8)))
        return out

    return assign


def geoms_from_table(t: pa.Table):
    """Unpack the geometry columns of an Arrow table into numpy views.

    Returns (ids, gtypes, offsets, values, minx, miny, maxx, maxy) where
    geometry i's flat coords are ``values[offsets[i]:offsets[i+1]]``.
    The list column is accessed via combine_chunks + raw buffers (zero-copy).
    """
    ids = t["id"].to_numpy(zero_copy_only=False)
    gtypes = t["gtype"].to_numpy(zero_copy_only=False)
    col = t["coords"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # empty table edge case
        arr = pa.array([], type=pa.list_(pa.float64()))
    offsets = np.asarray(arr.offsets)
    values = np.asarray(arr.values)
    return (ids, gtypes, offsets, values,
            t["minx"].to_numpy(zero_copy_only=False),
            t["miny"].to_numpy(zero_copy_only=False),
            t["maxx"].to_numpy(zero_copy_only=False),
            t["maxy"].to_numpy(zero_copy_only=False))
