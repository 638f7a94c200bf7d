"""zonal_area_weights: exact polygon ∩ tile areas via pair-vectorized
Sutherland-Hodgman — vs a scalar reference clipper, the
partition-of-unity invariant (tile areas sum to the shoelace area),
and partitioning invariance.
"""

import numpy as np
import pandas as pd

from hecatoncheir_ray.config import GridSpec
from hecatoncheir_ray.pipelines.tiling import zonal_area_weights

from tests.test_zonal import _zones_df, _zones_ds

GRID = GridSpec(0.0, 0.0, 16.0, 16.0, ppd=16)


def _clip_scalar(ring, x0, y0, x1, y1):
    """Textbook scalar Sutherland-Hodgman, the independent reference."""
    pts = list(zip(ring[0::2], ring[1::2]))
    for axis, bound, keep_ge in ((0, x0, True), (0, x1, False),
                                 (1, y0, True), (1, y1, False)):
        out = []
        for i in range(len(pts)):
            cur, nxt = pts[i], pts[(i + 1) % len(pts)]
            ic = cur[axis] >= bound if keep_ge else cur[axis] <= bound
            inn = nxt[axis] >= bound if keep_ge else nxt[axis] <= bound
            if ic != inn:
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                out.append((cur[0] + t * (nxt[0] - cur[0]),
                            cur[1] + t * (nxt[1] - cur[1])))
            if inn:
                out.append(nxt)
        pts = out
        if not pts:
            return 0.0
    a = 0.0
    for i in range(len(pts)):
        x, y = pts[i]
        xn, yn = pts[(i + 1) % len(pts)]
        a += x * yn - xn * y
    return 0.5 * abs(a)


def _shoelace(ring):
    xs, ys = ring[0::2], ring[1::2]
    a = 0.0
    for i in range(len(xs)):
        a += xs[i] * ys[(i + 1) % len(xs)] - xs[(i + 1) % len(xs)] * ys[i]
    return 0.5 * abs(a)


def test_vs_scalar_clipper(ray_session):
    zdf = _zones_df(21, 15)
    got = zonal_area_weights(_zones_ds(zdf), GRID).to_pandas()
    by_pair = {(int(r.zone_id), int(r.tile_id)): r.area
               for r in got.itertuples()}
    n_checked = 0
    for _, zr in zdf.iterrows():
        for t in range(GRID.ppd * GRID.ppd):
            tx, ty = t % GRID.ppd, t // GRID.ppd
            want = _clip_scalar(zr["ring"],
                                GRID.minx + tx * GRID.cell_w,
                                GRID.miny + ty * GRID.cell_h,
                                GRID.minx + (tx + 1.0) * GRID.cell_w,
                                GRID.miny + (ty + 1.0) * GRID.cell_h)
            have = by_pair.get((int(zr["zone_id"]), t), 0.0)
            assert abs(have - want) <= 1e-12 * max(1.0, want), (t, zr)
            n_checked += want > 0
    assert n_checked > 20


def test_partition_of_unity(ray_session):
    zdf = _zones_df(22, 30)
    got = zonal_area_weights(_zones_ds(zdf), GRID).to_pandas()
    sums = got.groupby("zone_id")["area"].sum()
    for _, zr in zdf.iterrows():
        want = _shoelace(zr["ring"])
        have = float(sums.get(int(zr["zone_id"]), 0.0))
        assert abs(have - want) <= 1e-9 * max(1.0, want)


def test_partitioning_invariance(ray_session):
    zdf = _zones_df(23, 20)
    outs = []
    for blocks in (1, 8):
        ds = _zones_ds(zdf).repartition(blocks)
        outs.append(zonal_area_weights(ds, GRID).to_pandas()
                    .sort_values(["zone_id", "tile_id"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)


def test_areal_interpolate_constant_raster(ray_session):
    """On a constant raster v the estimate is exactly
    v * zone_area / tile_area (up to float-sum tolerance)."""
    import ray.data as rd
    from hecatoncheir_ray.pipelines.tiling import areal_interpolate
    zdf = _zones_df(31, 20)
    v = 7
    tiles = pd.DataFrame({
        "tile_id": np.arange(GRID.ppd * GRID.ppd, dtype=np.int64),
        "n": np.full(GRID.ppd * GRID.ppd, v, dtype=np.int64)})
    got = areal_interpolate(_zones_ds(zdf), rd.from_pandas(tiles),
                            GRID, num_parts=16).to_pandas() \
        .set_index("zone_id")["est"]
    ta = GRID.cell_w * GRID.cell_h
    for _, zr in zdf.iterrows():
        want = v * _shoelace(zr["ring"]) / ta
        have = float(got.get(int(zr["zone_id"]), 0.0))
        assert abs(have - want) <= 1e-9 * max(1.0, want)


def test_areal_interpolate_vs_pandas(ray_session):
    """General raster: matches a pandas recomputation from the weights."""
    import ray.data as rd
    from hecatoncheir_ray.pipelines.tiling import (areal_interpolate,
                                                   zonal_area_weights)
    rng = np.random.RandomState(33)
    zdf = _zones_df(32, 15)
    occupied = np.flatnonzero(rng.rand(GRID.ppd * GRID.ppd) < 0.7)
    tiles = pd.DataFrame({
        "tile_id": occupied.astype(np.int64),
        "n": rng.randint(1, 50, len(occupied)).astype(np.int64)})
    got = areal_interpolate(_zones_ds(zdf), rd.from_pandas(tiles),
                            GRID, num_parts=16).to_pandas() \
        .sort_values("zone_id").reset_index(drop=True)
    w = zonal_area_weights(_zones_ds(zdf), GRID).to_pandas()
    m = w.merge(tiles, on="tile_id", how="inner")
    ta = GRID.cell_w * GRID.cell_h
    m["est"] = m["n"] * m["area"] / ta
    want = m.groupby("zone_id", as_index=False)["est"].sum() \
        .sort_values("zone_id").reset_index(drop=True)
    assert (got["zone_id"] == want["zone_id"]).all()
    assert np.allclose(got["est"], want["est"], rtol=1e-12, atol=1e-12)


def test_box_zones_clip_exactly(ray_session):
    """GT_BOX zones (2-corner storage) must clip like rectangles, not
    silently vanish as degenerate 2-vertex rings."""
    import pyarrow as pa
    import ray.data as rd
    from hecatoncheir_ray.geometry.core import GT_BOX
    from hecatoncheir_ray.pipelines.tiling import zonal_area_weights
    # a 3x2 box aligned to cover 1.5 tiles in x, fully inside the grid
    boxes = [(0, 2.5, 3.0, 5.5, 5.0), (1, 7.25, 7.25, 7.75, 7.75)]
    flat = np.concatenate([[x0, y0, x1, y1]
                           for _, x0, y0, x1, y1 in boxes])
    offs = np.arange(0, 4 * len(boxes) + 1, 4, dtype=np.int32)
    t = pa.table({
        "id": pa.array([b[0] for b in boxes], pa.int64()),
        "gtype": pa.array(np.full(len(boxes), GT_BOX, np.int8)),
        "coords": pa.ListArray.from_arrays(
            pa.array(offs), pa.array(flat, pa.float64())),
        "minx": pa.array([b[1] for b in boxes], pa.float64()),
        "miny": pa.array([b[2] for b in boxes], pa.float64()),
        "maxx": pa.array([b[3] for b in boxes], pa.float64()),
        "maxy": pa.array([b[4] for b in boxes], pa.float64())})
    got = zonal_area_weights(rd.from_arrow(t), GRID).to_pandas()
    sums = got.groupby("zone_id")["area"].sum()
    for zid, x0, y0, x1, y1 in boxes:
        want = (x1 - x0) * (y1 - y0)
        assert abs(float(sums[zid]) - want) <= 1e-12 * want
    # the sub-tile box covers exactly one tile
    assert (got[got.zone_id == 1].shape[0]) == 1
