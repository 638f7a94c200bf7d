"""zonal_stats (raster x vector): the distributed composition (tile
boxes -> broadcast join -> attach -> per-zone reduce) vs a brute-force
per-pair evaluation with the same exact geometry kernel; partitioning
invariance.  The geometry itself is end-to-end SQL-verified by the
driver row (test_entry_contract / CORRECTNESS `zonal_stats`).
"""

import numpy as np
import pandas as pd
import pytest

from hecatoncheir_ray.config import EngineConfig, GridSpec
from hecatoncheir_ray.geometry.core import GT_BOX, GT_POLYGON
from hecatoncheir_ray.geometry.fast import eval_predicate
from hecatoncheir_ray.pipelines.tiling import zonal_stats

GRID = GridSpec(0.0, 0.0, 16.0, 16.0, ppd=16)


def _zones_df(seed: int, k: int) -> pd.DataFrame:
    """k random convex quadrilateral zones (inscribed in jittered boxes)."""
    rng = np.random.RandomState(seed)
    rows = []
    for zid in range(k):
        cx, cy = rng.uniform(1, 15, 2)
        w, h = rng.uniform(0.8, 4.0, 2)
        # convex CCW quad: midpoints of the box edges, jittered inward
        j = rng.uniform(0.05, 0.45, 4)
        ring = np.array([
            cx, cy - h * (0.5 - j[0]),
            cx + w * (0.5 - j[1]), cy,
            cx, cy + h * (0.5 - j[2]),
            cx - w * (0.5 - j[3]), cy,
        ])
        rows.append((zid, ring))
    return pd.DataFrame({"zone_id": [r[0] for r in rows],
                         "ring": [r[1] for r in rows]})


def _zones_ds(zdf: pd.DataFrame):
    import pyarrow as pa
    import ray.data as rd
    rings = list(zdf["ring"])
    flat = np.concatenate(rings)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rings])])
    coords = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32)), pa.array(flat, pa.float64()))
    xs = [r[0::2] for r in rings]
    ys = [r[1::2] for r in rings]
    t = pa.table({
        "id": pa.array(zdf["zone_id"].to_numpy(), pa.int64()),
        "gtype": pa.array(np.full(len(zdf), GT_POLYGON, np.int8)),
        "coords": coords,
        "minx": pa.array([x.min() for x in xs], pa.float64()),
        "miny": pa.array([y.min() for y in ys], pa.float64()),
        "maxx": pa.array([x.max() for x in xs], pa.float64()),
        "maxy": pa.array([y.max() for y in ys], pa.float64())})
    return rd.from_arrow(t)


def _tiles_df(seed: int, frac: float) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    ids = np.flatnonzero(
        rng.rand(GRID.ppd * GRID.ppd) < frac).astype(np.int64)
    return pd.DataFrame({"tile_id": ids,
                         "n": rng.randint(1, 50, len(ids)).astype(np.int64)})


def _brute(tiles: pd.DataFrame, zdf: pd.DataFrame) -> pd.DataFrame:
    """Per-pair exact-kernel evaluation + pandas aggregate."""
    out = []
    for _, tr in tiles.iterrows():
        t = int(tr["tile_id"])
        tx, ty = t % GRID.ppd, t // GRID.ppd
        box = np.array([GRID.minx + tx * GRID.cell_w,
                        GRID.miny + ty * GRID.cell_h,
                        GRID.minx + (tx + 1.0) * GRID.cell_w,
                        GRID.miny + (ty + 1.0) * GRID.cell_h])
        for _, zr in zdf.iterrows():
            if eval_predicate("intersects", GT_BOX, box,
                              GT_POLYGON, zr["ring"]):
                out.append((int(zr["zone_id"]), int(tr["n"])))
    if not out:
        return pd.DataFrame({"zone_id": pd.Series([], dtype=np.int64),
                             "tile_count": pd.Series([], dtype=np.int64),
                             "total_n": pd.Series([], dtype=np.int64),
                             "min_n": pd.Series([], dtype=np.int64),
                             "max_n": pd.Series([], dtype=np.int64)})
    df = pd.DataFrame(out, columns=["zone_id", "n"])
    agg = df.groupby("zone_id", as_index=False).agg(
        tile_count=("n", "size"), total_n=("n", "sum"),
        min_n=("n", "min"), max_n=("n", "max"))
    return agg.sort_values("zone_id").reset_index(drop=True)


@pytest.mark.parametrize("seed,frac,nz", [(1, 0.6, 12), (2, 0.25, 20)])
def test_zonal_vs_brute(ray_session, seed, frac, nz):
    import ray.data as rd
    tiles = _tiles_df(seed, frac)
    zdf = _zones_df(seed + 100, nz)
    got = zonal_stats(rd.from_pandas(tiles).repartition(4),
                      _zones_ds(zdf), GRID,
                      cfg=EngineConfig(dataspace=(0.0, 0.0, 16.0, 16.0),
                                       ppd=16)) \
        .to_pandas().sort_values("zone_id").reset_index(drop=True)
    want = _brute(tiles, zdf)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype(np.int64),
        want[sorted(want.columns)].astype(np.int64), check_exact=True)
    assert want["tile_count"].sum() > 0     # non-vacuous fixture


def test_zonal_partitioning_invariance(ray_session):
    import ray.data as rd
    tiles = _tiles_df(5, 0.5)
    zdf = _zones_df(6, 10)
    cfg = EngineConfig(dataspace=(0.0, 0.0, 16.0, 16.0), ppd=16)
    outs = []
    for blocks in (1, 16):
        outs.append(
            zonal_stats(rd.from_pandas(tiles).repartition(blocks),
                        _zones_ds(zdf), GRID, cfg=cfg)
            .to_pandas().sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)


def test_tile_cover_exact_vs_brute(ray_session):
    """Exact cover == per-pair kernel scan; subset of the MBR cover."""
    from hecatoncheir_ray.pipelines.tiling import (tile_cover,
                                                   tile_cover_exact)
    zdf = _zones_df(11, 15)
    zds = _zones_ds(zdf)
    cfg = EngineConfig(dataspace=(0.0, 0.0, 16.0, 16.0), ppd=16)
    got = tile_cover_exact(zds, GRID, cfg).to_pandas()
    got_set = set(zip(got["id"], got["tile_id"]))
    mbr = tile_cover(zds, GRID).to_pandas()
    mbr_set = set(zip(mbr["id"], mbr["tile_id"]))
    assert got_set <= mbr_set
    want = set()
    for _, zr in zdf.iterrows():
        for t in range(GRID.ppd * GRID.ppd):
            tx, ty = t % GRID.ppd, t // GRID.ppd
            box = np.array([GRID.minx + tx * GRID.cell_w,
                            GRID.miny + ty * GRID.cell_h,
                            GRID.minx + (tx + 1.0) * GRID.cell_w,
                            GRID.miny + (ty + 1.0) * GRID.cell_h])
            if eval_predicate("intersects", GT_BOX, box,
                              GT_POLYGON, zr["ring"]):
                want.add((int(zr["zone_id"]), t))
    assert got_set == want
    assert len(want) > 0


def test_zonal_broadcast_vs_shuffle_parity(ray_session):
    """broadcast=False (grid-shuffle join) must produce the identical
    per-zone table — the path for zone layers too large to broadcast."""
    import ray.data as rd
    tiles = _tiles_df(3, 0.5)
    zdf = _zones_df(4, 12)
    cfg = EngineConfig(dataspace=(0.0, 0.0, 16.0, 16.0), ppd=16)
    outs = []
    for bc in (True, False):
        outs.append(
            zonal_stats(rd.from_pandas(tiles).repartition(4),
                        _zones_ds(zdf), GRID, cfg=cfg, broadcast=bc)
            .to_pandas().sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    assert len(outs[0]) > 0
