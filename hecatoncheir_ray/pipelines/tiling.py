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


def tile_cover_exact(geoms: Dataset, grid: GridSpec,
                     cfg=None) -> Dataset:
    """EXACT tile cover: (id, tile_id) for every tile whose RECTANGLE
    intersects the geometry itself — not just its MBR (``tile_cover``'s
    rule; identical for boxes, a strict subset for polygons/lines, e.g.
    a thin diagonal polygon's MBR cover is O(n^2) tiles while its exact
    cover is O(n)).

    Zero shuffle: per geometry batch, MBR cells from ``explode_cells``
    are refined by the engine's own ``refine_mask`` intersect kernel
    over a local tiles+geometries SoA (the same combined-SoA trick the
    broadcast join uses) — one vectorized call per batch, tile
    rectangles (4-vertex rings, see :func:`_tile_rect_soa`) built only
    for the batch's DISTINCT candidate tiles."""
    from ..config import EngineConfig
    from ..geometry.core import GT_POLYGON
    from ..stages.assign import geoms_from_table
    from ..stages.sweep import refine_mask
    cfg = cfg or EngineConfig()

    def cover(t: pa.Table) -> pa.Table:
        ids, gt, offs, vals, minx, miny, maxx, maxy = geoms_from_table(t)
        rows, cells = explode_cells(grid, minx, miny, maxx, maxy)
        if len(rows) == 0:
            return TILE_SCHEMA.empty_table()
        uc = np.unique(cells)
        nt = len(uc)
        (tflat, toffs, t_minx, t_miny,
         t_maxx, t_maxy) = _tile_rect_soa(uc, grid)
        # combined SoA: tiles occupy [0, nt), the batch's geometries
        # follow — mirrors spatial_join_broadcast's layout
        geo = (np.concatenate([uc, ids]),
               np.concatenate([np.full(nt, GT_POLYGON, np.int8), gt]),
               np.concatenate([toffs,
                               offs[1:].astype(np.int64) + toffs[-1]]),
               np.concatenate([tflat, vals]),
               np.concatenate([t_minx, minx]),
               np.concatenate([t_miny, miny]),
               np.concatenate([t_maxx, maxx]),
               np.concatenate([t_maxy, maxy]))
        ti = np.searchsorted(uc, cells)
        gi = rows + nt
        keep = refine_mask(cfg, geo, gi, ti, "intersects")
        return pa.table({"id": pa.array(ids[rows[keep]], pa.int64()),
                         "tile_id": pa.array(cells[keep], pa.int64())},
                        schema=TILE_SCHEMA)

    return geoms.map_batches(cover, batch_format="pyarrow")


def tile_counts_ds(assignments: Dataset, num_parts: int = 64) -> Dataset:
    """(id, tile_id) -> Dataset(tile_id, n) for non-empty tiles — the
    raster stays in the object store (feed it to :func:`raster_regions`
    at scale); ``tile_counts`` is the driver-materializing wrapper.

    Per-batch SPARSE (tile, count) partials + one shuffle-side groupby
    Sum — partial size tracks the batch's distinct tiles (not ppd^2
    dense), so the same code holds at ppd 32 and ppd 4096.  The Sum
    merge is a hash-partitioned pandas reduce: tile cardinality reaches
    ppd^2 and Ray's sort-based aggregate pays ~0.3 ms coordination per
    group."""
    from ..functions.idjoin import hash_group_reduce

    def partial(t: pa.Table) -> pa.Table:
        c = t["tile_id"].to_numpy(zero_copy_only=False)
        uc, cnt = np.unique(c, return_counts=True)
        return pa.table({"tile_id": pa.array(uc, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    return hash_group_reduce(
        assignments.map_batches(partial, batch_format="pyarrow"),
        ["tile_id"], {"n": ("n", "sum")}, num_parts=num_parts)


def tile_counts(assignments: Dataset, grid: GridSpec | None = None):
    """Driver-materialized (sorted) :func:`tile_counts_ds` — the driver
    only ever sees the non-empty result rows.  ``grid`` is accepted for
    backward compatibility but unused (counting is grid-independent
    once assignments exist)."""
    out = tile_counts_ds(assignments).to_pandas()
    out["tile_id"] = out["tile_id"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("tile_id").reset_index(drop=True)


def _label_components_kernel(g):
    """Single-task min-label connected components over one edge group:
    vectorized edge relaxation + full pointer-jumping compression per
    round (O(log n) rounds, each a few numpy passes).  Labels are
    indices into the sorted node array, so the converged label is the
    component's MINIMUM node id — the same labeling the alternating-star
    path produces."""
    import pandas as pd
    if len(g) == 0:
        return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64)})
    u = g["u"].to_numpy().astype(np.int64)
    v = g["v"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab
        lab = lab.copy()
        np.minimum.at(lab, ui, old[vi])
        np.minimum.at(lab, vi, old[ui])
        while True:                       # full path compression
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    return pd.DataFrame({"u": nodes, "v": nodes[lab]})


def label_regions(values: Dataset, id_col: str, edge_fn, threshold: int,
                  num_parts: int = 64,
                  single_task_max: int = 1 << 22):
    """Shared lattice-polygonize core (square tiles AND hex cells use
    this): threshold filter -> neighbor candidate edges (``edge_fn(ids)
    -> (u, v)``, directed; CC symmetrizes) -> reduce-side semi-join (a
    neighbor must itself be kept; no dense lattice materialized) ->
    adaptive component labeling -> one Min/Sum reduce.

    Returns the (u=<cell id>, region_id, nn=<cell value>) label Dataset,
    or None when nothing survives the threshold.

    Adaptive labeling: a lattice graph is raster-cardinality (<= cells,
    never corpus-scale), so up to ``single_task_max`` kept cells it
    labels in ONE worker task (vectorized union-find,
    :func:`_label_components_kernel`) — the alternating-star loop's ~3
    Ray stages PER ROUND are pure coordination overhead at that size
    (measured 34 s -> ~4 s on a 4096-tile raster).  Larger lattices
    take the star path unchanged (parity-tested)."""
    import pandas as pd

    from ..functions.dedup import connected_components
    from ..functions.idjoin import filter_by_ids, hash_group_reduce

    def kept_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = df["n"].to_numpy() >= threshold
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy()[m].astype(np.int64),
             "n": df["n"].to_numpy()[m].astype(np.int64)})

    # pinned once: edge source + semi-join id side + identity label rows
    kept = values.map_batches(kept_rows,
                              batch_format="pandas").materialize()
    if kept.count() == 0:
        # an all-empty input yields schema-less downstream Datasets that
        # poison the id joins; the scalar count is free on a
        # materialized Dataset
        return None

    def cand_edges(df: pd.DataFrame) -> pd.DataFrame:
        u, v = edge_fn(df[id_col].to_numpy().astype(np.int64))
        return pd.DataFrame({"u": u, "v": v})

    edges = filter_by_ids(
        kept.map_batches(cand_edges, batch_format="pandas"),
        "v", kept, id_col, keep=True, num_parts=num_parts)
    if kept.count() <= single_task_max:
        stars = edges \
            .map_batches(lambda df: df.assign(_p=np.int64(0)),
                         batch_format="pandas") \
            .groupby("_p").map_groups(_label_components_kernel,
                                      batch_format="pandas")
    else:
        stars = connected_components(edges, num_parts=num_parts)

    # label every kept cell: identity rows carry the cell's value
    # (stars carry 0), so one Min/Sum reduce yields (cell, region, n)
    def ident(df: pd.DataFrame) -> pd.DataFrame:
        t = df[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame({"u": t, "v": t,
                             "n": df["n"].to_numpy().astype(np.int64)})

    def zero_n(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["u"].to_numpy().astype(np.int64),
                             "v": df["v"].to_numpy().astype(np.int64),
                             "n": np.zeros(len(df), dtype=np.int64)})

    return hash_group_reduce(
        kept.map_batches(ident, batch_format="pandas")
            .union(stars.map_batches(zero_n, batch_format="pandas")),
        ["u"], {"region_id": ("v", "min"), "nn": ("n", "sum")},
        num_parts=num_parts)


def region_empty(count_col: str) -> Dataset:
    """Typed empty region table (pandas block: Dataset.to_pandas()
    drops the schema of empty ARROW blocks on Ray 2.49, but
    concatenating pandas blocks keeps the typed empty columns)."""
    import pandas as pd
    import ray.data

    return ray.data.from_pandas(pd.DataFrame({
        "region_id": pd.Series([], dtype=np.int64),
        count_col: pd.Series([], dtype=np.int64),
        "total_n": pd.Series([], dtype=np.int64),
        "minx": pd.Series([], dtype=np.float64),
        "miny": pd.Series([], dtype=np.float64),
        "maxx": pd.Series([], dtype=np.float64),
        "maxy": pd.Series([], dtype=np.float64)}))


def region_reduce(labels: Dataset, count_col: str, cell_bounds_fn,
                  num_parts: int = 64) -> Dataset:
    """Shared per-region reduce for the lattice polygonizers:
    (u, region_id, nn) labels -> (region_id, <count_col>, total_n,
    minx, miny, maxx, maxy).  ``cell_bounds_fn(u) -> (x_lo, y_lo,
    x_hi, y_hi)`` gives each cell's contribution to the bbox (corners
    for square tiles, centers for hex cells).  Per-batch pandas
    partials + one hash_group_reduce; min/max over the per-cell floats
    equals the transform of the min/max index bit-exactly because the
    coordinate expressions are monotone in the cell index (IEEE
    rounding preserves weak monotonicity), so the SQL twins'
    aggregate-then-transform form matches."""
    import pandas as pd

    from ..functions.idjoin import hash_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy().astype(np.int64)
        x_lo, y_lo, x_hi, y_hi = cell_bounds_fn(u)
        g = pd.DataFrame(
            {"region_id": df["region_id"].to_numpy().astype(np.int64),
             count_col: np.ones(len(df), dtype=np.int64),
             "total_n": df["nn"].to_numpy().astype(np.int64),
             "x0": x_lo, "x1": x_hi, "y0": y_lo, "y1": y_hi})
        return g.groupby("region_id", as_index=False).agg(
            **{count_col: (count_col, "sum")},
            total_n=("total_n", "sum"),
            x0=("x0", "min"), x1=("x1", "max"),
            y0=("y0", "min"), y1=("y1", "max"))

    red = hash_group_reduce(
        labels.map_batches(partial, batch_format="pandas"),
        ["region_id"],
        {count_col: (count_col, "sum"), "total_n": ("total_n", "sum"),
         "x0": ("x0", "min"), "x1": ("x1", "max"),
         "y0": ("y0", "min"), "y1": ("y1", "max")},
        num_parts=num_parts)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "region_id": df["region_id"].to_numpy().astype(np.int64),
            count_col: df[count_col].to_numpy().astype(np.int64),
            "total_n": df["total_n"].to_numpy().astype(np.int64),
            "minx": df["x0"].to_numpy().astype(np.float64),
            "miny": df["y0"].to_numpy().astype(np.float64),
            "maxx": df["x1"].to_numpy().astype(np.float64),
            "maxy": df["y1"].to_numpy().astype(np.float64)})

    return red.map_batches(finish, batch_format="pandas")


def raster_regions(tile_values: Dataset, grid: GridSpec, threshold: int,
                   num_parts: int = 64,
                   single_task_max_tiles: int = 1 << 22) -> Dataset:
    """Raster -> VECTOR (the reverse tiling direction of the north rule):
    4-connected components of above-threshold raster tiles, one vector
    feature per region — (region_id, tile_count, total_n, minx, miny,
    maxx, maxy) with region_id = the component's minimum tile_id and the
    bbox in dataspace coordinates.  The classic "polygonize" step that
    turns a density/heat raster back into query geometry (e.g. hot-spot
    extraction over a point corpus).

    Scale shape: everything is tile-cardinality (<= ppd^2, independent
    of the input corpus); the shared :func:`label_regions` core does the
    threshold filter, semi-joined 4-adjacency edges, and adaptive
    component labeling; the per-region bbox/total reduce is one
    hash_group_reduce over per-batch partials.  The driver never sees
    per-tile rows.

    Float policy: the bbox arithmetic is exactly two IEEE ops per bound
    (``grid_origin + index * cell_size``), written identically in the
    SQL twin — bit-exact checkable like quadkey/hex_sql."""
    ppd = grid.ppd

    def edge_fn(t: np.ndarray):
        right = t[(t % ppd) < ppd - 1]        # row-major: +1 unless at
        up = t[(t // ppd) < ppd - 1]          # the x edge; +ppd for y
        return (np.concatenate([right, up]),
                np.concatenate([right + 1, up + ppd]))

    labels = label_regions(tile_values, "tile_id", edge_fn, threshold,
                           num_parts, single_task_max_tiles)
    if labels is None:
        return region_empty("tile_count")

    gx0, gy0 = grid.minx, grid.miny
    cw, ch = grid.cell_w, grid.cell_h

    def bounds_fn(t: np.ndarray):
        tx = (t % ppd).astype(np.float64)
        ty = (t // ppd).astype(np.float64)
        return (gx0 + tx * cw, gy0 + ty * ch,
                gx0 + (tx + 1.0) * cw, gy0 + (ty + 1.0) * ch)

    return region_reduce(labels, "tile_count", bounds_fn, num_parts)


def _tile_rect_soa(tid: np.ndarray, grid: GridSpec):
    """tile ids -> (ring coords flat, offsets, minx, miny, maxx, maxy).

    Rectangles are emitted as 4-vertex CCW POLYGON rings, not GT_BOX:
    refine_mask's mega-batched intersect path covers polygon x polygon
    (and range_query likewise converts its box windows via box_to_ring);
    a GT_BOX x GT_POLYGON pair would fall through to the per-pair
    Python remainder — measured 12x slower on the zonal join."""
    tx = (tid % grid.ppd).astype(np.float64)
    ty = (tid // grid.ppd).astype(np.float64)
    gx0, gy0 = grid.minx, grid.miny
    cw, ch = grid.cell_w, grid.cell_h
    minx, miny = gx0 + tx * cw, gy0 + ty * ch
    maxx, maxy = gx0 + (tx + 1.0) * cw, gy0 + (ty + 1.0) * ch
    flat = np.empty(8 * len(tid))
    flat[0::8], flat[1::8] = minx, miny
    flat[2::8], flat[3::8] = maxx, miny
    flat[4::8], flat[5::8] = maxx, maxy
    flat[6::8], flat[7::8] = minx, maxy
    offs = np.arange(0, 8 * len(tid) + 1, 8, dtype=np.int64)
    return flat, offs, minx, miny, maxx, maxy


def tile_boxes(tiles: Dataset, grid: GridSpec) -> Dataset:
    """(tile_id, ...) raster rows -> geometry table of tile rectangles
    (id = tile_id, 4-vertex polygon rings) in dataspace coordinates —
    the raster side of a raster x vector join.  Same two-IEEE-op corner
    arithmetic as :func:`raster_regions` (SQL-twin exact)."""
    from ..geometry.core import GT_POLYGON

    def build(t: pa.Table) -> pa.Table:
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs, minx, miny, maxx, maxy = _tile_rect_soa(tid, grid)
        coords = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32)),
            pa.array(flat, type=pa.float64()))
        return pa.table({
            "id": pa.array(tid, type=pa.int64()),
            "gtype": pa.array(np.full(len(tid), GT_POLYGON, np.int8)),
            "coords": coords,
            "minx": pa.array(minx), "miny": pa.array(miny),
            "maxx": pa.array(maxx), "maxy": pa.array(maxy)})

    return tiles.map_batches(build, batch_format="pyarrow")


def zonal_stats(tiles: Dataset, zones: Dataset, grid: GridSpec,
                predicate: str = "intersects", cfg=None,
                broadcast: bool | str = "auto") -> Dataset:
    """Zonal statistics (the canonical raster x vector analysis): per
    zone polygon, aggregate the raster tiles whose rectangle satisfies
    ``predicate`` against the zone -> (zone_id, tile_count, total_n,
    min_n, max_n).

    Composition, all existing machinery: the sparse raster becomes a
    tile-rectangle geometry layer (:func:`tile_boxes`), joins the zone
    layer through the zero-shuffle broadcast spatial join (zones are the
    small side — exactly the admin-polygon case it was built for), tile
    values ride a reduce-side attach join, and the per-zone reduce is
    one `hash_group_reduce`.  Exact geometry (MBR filter + convex
    refinement), not rasterized-zone approximation; everything after
    the raster build is tile-cardinality.

    ``broadcast="auto"`` (default) picks the path from a BOUNDED prefix
    count of the zone layer (``spatial_join_auto``): at or under
    :data:`~..pipelines.spatial_join.BROADCAST_MAX_ROWS` zones the
    zero-shuffle broadcast wins; above it the grid shuffle was measured
    1.2-2.5x faster on this repo's own sf0.1 fixture (BENCH "Zonal path
    note") — the probe itself never scans more than the threshold + 1
    zone rows.  ``broadcast=True`` / ``False`` force a path (identical
    pair set either way; parity tested)."""
    import pandas as pd

    from ..functions.idjoin import attach_i64_by_id, hash_group_reduce
    from .spatial_join import spatial_join_auto

    tiles = tiles.materialize()       # consumed twice: boxes + lookup
    pairs = spatial_join_auto(tile_boxes(tiles, grid), zones,
                              predicate, cfg, broadcast=broadcast)
    att = attach_i64_by_id(pairs, "r_id", tiles, "tile_id", "n", "n")
    red = hash_group_reduce(att, ["s_id"], {
        "tile_count": ("n", "count"), "total_n": ("n", "sum"),
        "min_n": ("n", "min"), "max_n": ("n", "max")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "zone_id": df["s_id"].to_numpy().astype(np.int64),
            "tile_count": df["tile_count"].to_numpy().astype(np.int64),
            "total_n": df["total_n"].to_numpy().astype(np.int64),
            "min_n": df["min_n"].to_numpy().astype(np.int64),
            "max_n": df["max_n"].to_numpy().astype(np.int64)})

    return red.map_batches(finish, batch_format="pandas")


def _clip_halfplane(X, Y, m, axis: int, bound, keep_ge: bool):
    """One Sutherland-Hodgman half-plane clip, vectorized across pairs.

    X, Y: (P, C) vertex buffers; m: (P,) vertex counts.  Clips against
    ``coord >= bound`` (keep_ge) or ``coord <= bound`` along ``axis``
    (0 = x, 1 = y).  Returns new (X, Y, m) with capacity 2C — each edge
    emits at most 2 vertices, compacted by per-row cumsum scatter; no
    per-pair Python."""
    P, C = X.shape
    if P == 0:
        return X, Y, m
    cols = np.arange(C)[None, :]
    valid_v = cols < m[:, None]
    nxt = np.where(cols + 1 < m[:, None], cols + 1, 0)
    Xn = np.take_along_axis(X, nxt, axis=1)
    Yn = np.take_along_axis(Y, nxt, axis=1)
    V = X if axis == 0 else Y
    Vn = Xn if axis == 0 else Yn
    ins_c = (V >= bound) if keep_ge else (V <= bound)
    ins_n = (Vn >= bound) if keep_ge else (Vn <= bound)
    # edge-plane intersection point (only used where ins_c != ins_n,
    # where the denominator is nonzero)
    den = Vn - V
    t = np.where(den != 0.0, (bound - V) / np.where(den == 0.0, 1.0, den),
                 0.0)
    Ix = X + t * (Xn - X)
    Iy = Y + t * (Yn - Y)
    # SH emission per edge: slot 0 = intersection (entering or leaving),
    # slot 1 = the next vertex (only when inside)
    emit_i = valid_v & (ins_c != ins_n)
    emit_n = valid_v & ins_n
    C2 = 2 * C
    ex = np.empty((P, C2))
    ey = np.empty((P, C2))
    ev = np.empty((P, C2), dtype=bool)
    ex[:, 0::2], ey[:, 0::2], ev[:, 0::2] = Ix, Iy, emit_i
    ex[:, 1::2], ey[:, 1::2], ev[:, 1::2] = Xn, Yn, emit_n
    pos = np.cumsum(ev, axis=1) - 1
    m_out = np.where(ev.any(axis=1), pos[:, -1] + 1, 0).astype(np.int64)
    # trim to the real max vertex count: a convex clip grows counts by
    # at most a few, so untrimmed doubling would run the later clips
    # and the shoelace over 16x-wider buffers than needed
    Cout = max(int(m_out.max(initial=0)), 1)
    Xo = np.zeros((P, Cout))
    Yo = np.zeros((P, Cout))
    rows, colsv = np.nonzero(ev)
    Xo[rows, pos[ev]] = ex[ev]
    Yo[rows, pos[ev]] = ey[ev]
    return Xo, Yo, m_out


def zonal_area_weights(zones: Dataset, grid: GridSpec) -> Dataset:
    """Area-weighted raster x vector coverage (areal interpolation):
    (zone_id, tile_id, area) with ``area`` the EXACT area of
    zone-polygon ∩ tile-rectangle, for every overlapped tile.

    Zero shuffle: per zone batch, MBR cells from ``explode_cells``; each
    (zone, tile) candidate is clipped by the tile's four half-planes
    with a pair-vectorized Sutherland-Hodgman (numpy passes over all
    pairs per clip — never a Python loop over pairs) and measured by
    the shoelace.  SH against a convex clip window is exact for any
    simple polygon; zero-area slivers are dropped.

    The partition-of-unity invariant — per zone, the tile areas sum to
    the polygon's shoelace area (tiles tile the plane) — is the
    operator's self-oracle; the driver query asserts it per row."""
    from ..stages.assign import geoms_from_table

    def weights(t: pa.Table) -> pa.Table:
        ids, gt, offs, vals, minx, miny, maxx, maxy = geoms_from_table(t)
        rows, cells = explode_cells(grid, minx, miny, maxx, maxy)
        out_schema = pa.schema([("zone_id", pa.int64()),
                                ("tile_id", pa.int64()),
                                ("area", pa.float64())])
        if len(rows) == 0:
            return out_schema.empty_table()
        from ..geometry.core import GT_BOX
        offs = offs.astype(np.int64)
        nv = ((offs[1:] - offs[:-1]) // 2).astype(np.int64)
        is_box = gt == GT_BOX
        nv_eff = np.where(is_box, 4, nv)      # boxes clip as 4-v rings
        C = max(int(nv_eff.max()), 4)
        n = len(ids)
        # ragged rings -> (n, C) buffers, then gather per candidate pair
        vx = np.zeros((n, C))
        vy = np.zeros((n, C))
        cols = np.arange(C)[None, :]
        mask = (cols < nv[:, None]) & ~is_box[:, None]
        flat_idx = offs[:-1, None] + 2 * cols
        vx[mask] = vals[flat_idx[mask]]
        vy[mask] = vals[flat_idx[mask] + 1]
        if is_box.any():
            # a GT_BOX row stores 2 corner points; expand to the CCW
            # rectangle ring so it clips like any polygon (a 2-vertex
            # "ring" would shoelace to zero and silently vanish)
            b = np.flatnonzero(is_box)
            vx[b, 0] = vx[b, 3] = minx[b]
            vx[b, 1] = vx[b, 2] = maxx[b]
            vy[b, 0] = vy[b, 1] = miny[b]
            vy[b, 2] = vy[b, 3] = maxy[b]
        X, Y, m = vx[rows], vy[rows], nv_eff[rows]
        tx = (cells % grid.ppd).astype(np.float64)
        ty = (cells // grid.ppd).astype(np.float64)
        x0 = grid.minx + tx * grid.cell_w
        y0 = grid.miny + ty * grid.cell_h
        x1 = grid.minx + (tx + 1.0) * grid.cell_w
        y1 = grid.miny + (ty + 1.0) * grid.cell_h
        X, Y, m = _clip_halfplane(X, Y, m, 0, x0[:, None], True)
        X, Y, m = _clip_halfplane(X, Y, m, 0, x1[:, None], False)
        X, Y, m = _clip_halfplane(X, Y, m, 1, y0[:, None], True)
        X, Y, m = _clip_halfplane(X, Y, m, 1, y1[:, None], False)
        # shoelace over the clipped rings (masked cyclic next)
        P2, C2 = X.shape
        cols2 = np.arange(C2)[None, :]
        vmask = cols2 < m[:, None]
        nxt = np.where(cols2 + 1 < m[:, None], cols2 + 1, 0)
        Xn = np.take_along_axis(X, nxt, axis=1)
        Yn = np.take_along_axis(Y, nxt, axis=1)
        cross = np.where(vmask, X * Yn - Xn * Y, 0.0)
        area = 0.5 * np.abs(cross.sum(axis=1))
        keep = area > 0.0
        return pa.table({
            "zone_id": pa.array(ids[rows[keep]], pa.int64()),
            "tile_id": pa.array(cells[keep], pa.int64()),
            "area": pa.array(area[keep], pa.float64())},
            schema=out_schema)

    return zones.map_batches(weights, batch_format="pyarrow")


def areal_interpolate(zones: Dataset, tile_values: Dataset,
                      grid: GridSpec, num_parts: int = 64) -> Dataset:
    """Areal interpolation (the end-use of :func:`zonal_area_weights`):
    transfer a tile raster's values onto zone polygons weighted by
    exact coverage — (zone_id, est) with
    ``est = sum_t value_t * area(zone ∩ t) / tile_area``.

    The standard downscaling estimator (raster counts assumed uniform
    within a tile).  Closed-form check: on a CONSTANT raster v the
    estimate collapses to ``v * zone_area / tile_area`` exactly — the
    driver query's in-query oracle.

    Scale shape: weights stream zero-shuffle out of the clipper; the
    only exchanges are the reduce-side value attach and the per-zone
    Sum, both pair-cardinality."""
    import pandas as pd

    from ..functions.idjoin import (attach_i64_by_id, filter_by_ids,
                                    hash_group_reduce)

    # two consumers below (semi-join id side + attach lookup side): pin
    # once or the whole upstream raster pipeline re-executes per use
    tile_values = tile_values.materialize()
    # tiles absent from the (sparse) raster have value 0 and contribute
    # nothing: semi-join the weights down before the attach (which
    # requires every key present, by design)
    w = filter_by_ids(zonal_area_weights(zones, grid), "tile_id",
                      tile_values, "tile_id", keep=True,
                      num_parts=num_parts)
    att = attach_i64_by_id(w, "tile_id", tile_values,
                           "tile_id", "n", "n", num_parts=num_parts)
    tile_area = grid.cell_w * grid.cell_h

    def part(df: pd.DataFrame) -> pd.DataFrame:
        est = (df["n"].to_numpy().astype(np.float64)
               * df["area"].to_numpy() / tile_area)
        g = pd.DataFrame({"zone_id":
                          df["zone_id"].to_numpy().astype(np.int64),
                          "est": est})
        return g.groupby("zone_id", as_index=False).agg(
            est=("est", "sum"))

    return hash_group_reduce(
        att.map_batches(part, batch_format="pandas"),
        ["zone_id"], {"est": ("est", "sum")}, num_parts=num_parts)


def raster_regions_sql(tiles_sql: str, grid: GridSpec,
                       threshold) -> str:
    """DuckDB twin of :func:`raster_regions` over ``tiles_sql`` (any
    relation with columns tile_id, n): recursive-CTE reachability for
    the component min-label (the near_dup_clusters_sql pattern), with
    the SAME two-IEEE-op bbox arithmetic as the Ray side.

    ``threshold``: an int, or a scalar SQL expression string (e.g. a
    COUNT(*) subquery) when the twin must derive it from the data."""
    ppd = grid.ppd
    gx0, gy0 = grid.minx, grid.miny
    cw, ch = grid.cell_w, grid.cell_h
    return f"""
        WITH RECURSIVE kept AS (
            SELECT tile_id, n FROM ({tiles_sql}) WHERE n >= {threshold}),
        edges AS (
            SELECT a.tile_id AS u, b.tile_id AS v FROM kept a
            JOIN kept b ON b.tile_id = a.tile_id + 1
            WHERE a.tile_id % {ppd} < {ppd - 1}
            UNION ALL
            SELECT a.tile_id, b.tile_id FROM kept a
            JOIN kept b ON b.tile_id = a.tile_id + {ppd}
            UNION ALL
            SELECT a.tile_id, b.tile_id FROM kept a
            JOIN kept b ON b.tile_id = a.tile_id - 1
            WHERE a.tile_id % {ppd} > 0
            UNION ALL
            SELECT a.tile_id, b.tile_id FROM kept a
            JOIN kept b ON b.tile_id = a.tile_id - {ppd}),
        reach AS (SELECT tile_id AS u, tile_id AS v FROM kept
                  UNION
                  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v),
        labels AS (SELECT u AS tile_id, MIN(v) AS region_id
                   FROM reach GROUP BY 1)
        SELECT l.region_id AS region_id,
               COUNT(*) AS tile_count,
               CAST(SUM(k.n) AS BIGINT) AS total_n,
               -- STRING casts: DuckDB parses a bare decimal literal as
               -- DECIMAL and converts DECIMAL->DOUBLE by a double
               -- division (observed 1-ulp off vs the correctly-rounded
               -- strtod parse for cell_w's 17-digit repr); a
               -- string->DOUBLE cast round-trips exactly
               CAST('{gx0!r}' AS DOUBLE)
                 + MIN(k.tile_id % {ppd}) * CAST('{cw!r}' AS DOUBLE)
                 AS minx,
               CAST('{gy0!r}' AS DOUBLE)
                 + MIN(k.tile_id // {ppd}) * CAST('{ch!r}' AS DOUBLE)
                 AS miny,
               CAST('{gx0!r}' AS DOUBLE)
                 + (MAX(k.tile_id % {ppd}) + 1) * CAST('{cw!r}' AS DOUBLE)
                 AS maxx,
               CAST('{gy0!r}' AS DOUBLE)
                 + (MAX(k.tile_id // {ppd}) + 1) * CAST('{ch!r}' AS DOUBLE)
                 AS maxy
        FROM labels l JOIN kept k ON k.tile_id = l.tile_id
        GROUP BY 1
    """


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
