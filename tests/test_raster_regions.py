"""raster_regions (raster -> vector polygonize): 4-connected components
of above-threshold tiles vs a brute-force union-find oracle and the
recursive-CTE DuckDB twin; partitioning invariance; edge cases.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from hecatoncheir_ray.config import GridSpec
from hecatoncheir_ray.pipelines.tiling import (raster_regions,
                                               raster_regions_sql)

GRID = GridSpec(-10.0, -5.0, 22.0, 11.0, ppd=16)


def _brute_regions(tiles: pd.DataFrame, grid: GridSpec,
                   threshold: int) -> pd.DataFrame:
    """Union-find oracle over the dense tile lattice."""
    kept = tiles[tiles["n"] >= threshold]
    ids = kept["tile_id"].to_numpy().astype(np.int64)
    ns = kept["n"].to_numpy().astype(np.int64)
    parent = {int(t): int(t) for t in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ppd = grid.ppd
    s = set(parent)
    for t in list(s):
        if t % ppd < ppd - 1 and t + 1 in s:
            union(t, t + 1)
        if t // ppd < ppd - 1 and t + ppd in s:
            union(t, t + ppd)
    rows = {}
    for t, n in zip(ids.tolist(), ns.tolist()):
        r = find(t)
        tx, ty = t % ppd, t // ppd
        if r not in rows:
            rows[r] = [0, 0, tx, tx, ty, ty]
        agg = rows[r]
        agg[0] += 1
        agg[1] += n
        agg[2] = min(agg[2], tx)
        agg[3] = max(agg[3], tx)
        agg[4] = min(agg[4], ty)
        agg[5] = max(agg[5], ty)
    out = pd.DataFrame(
        [{"region_id": r, "tile_count": a[0], "total_n": a[1],
          "minx": grid.minx + float(a[2]) * grid.cell_w,
          "miny": grid.miny + float(a[4]) * grid.cell_h,
          "maxx": grid.minx + (float(a[3]) + 1.0) * grid.cell_w,
          "maxy": grid.miny + (float(a[5]) + 1.0) * grid.cell_h}
         for r, a in rows.items()])
    if len(out) == 0:
        return pd.DataFrame({"region_id": pd.Series([], dtype=np.int64),
                             "tile_count": pd.Series([], dtype=np.int64),
                             "total_n": pd.Series([], dtype=np.int64),
                             "minx": pd.Series([], dtype=np.float64),
                             "miny": pd.Series([], dtype=np.float64),
                             "maxx": pd.Series([], dtype=np.float64),
                             "maxy": pd.Series([], dtype=np.float64)})
    return out.sort_values("region_id").reset_index(drop=True)


def _rand_tiles(seed: int, frac: float) -> pd.DataFrame:
    """Deterministic sparse raster over the 16x16 lattice."""
    rng = np.random.RandomState(seed)
    n_cells = GRID.ppd * GRID.ppd
    ids = np.flatnonzero(rng.rand(n_cells) < frac).astype(np.int64)
    return pd.DataFrame({"tile_id": ids,
                         "n": rng.randint(1, 9, len(ids)).astype(np.int64)})


def _run(tiles: pd.DataFrame, threshold: int, blocks: int = 4):
    import ray.data as rd
    ds = rd.from_pandas(tiles).repartition(blocks)
    got = raster_regions(ds, GRID, threshold, num_parts=16).to_pandas()
    return got.sort_values("region_id").reset_index(drop=True)


@pytest.mark.parametrize("seed,frac,threshold",
                         [(1, 0.55, 1), (2, 0.35, 3), (3, 0.8, 2),
                          (4, 0.15, 1)])
def test_vs_union_find(ray_session, seed, frac, threshold):
    tiles = _rand_tiles(seed, frac)
    got = _run(tiles, threshold)
    want = _brute_regions(tiles, GRID, threshold)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_exact=True)


def test_vs_sql_twin(ray_session):
    tiles = _rand_tiles(7, 0.5)
    got = _run(tiles, 2)
    con = duckdb.connect()
    con.register("tiles_src", tiles)
    want = con.execute(raster_regions_sql(
        "SELECT tile_id, n FROM tiles_src", GRID, 2)).df() \
        .sort_values("region_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True)


def test_partitioning_invariance(ray_session):
    tiles = _rand_tiles(9, 0.6)
    a = _run(tiles, 1, blocks=1)
    b = _run(tiles, 1, blocks=16)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_all_below_threshold_empty(ray_session):
    import ray.data as rd
    tiles = _rand_tiles(5, 0.4)
    ds = rd.from_pandas(tiles).repartition(4)
    got = raster_regions(ds, GRID, 100, num_parts=16)
    # Dataset.to_pandas() drops columns of ANY empty dataset (Ray 2.49
    # quirk), so assert emptiness + schema on the Dataset itself
    assert got.count() == 0
    assert set(got.schema().names) == {"region_id", "tile_count",
                                       "total_n", "minx", "miny",
                                       "maxx", "maxy"}


def test_single_tiles_are_singleton_regions(ray_session):
    # a diagonal is never 4-connected: every tile is its own region
    ids = np.arange(8, dtype=np.int64) * (GRID.ppd + 1)
    tiles = pd.DataFrame({"tile_id": ids,
                          "n": np.full(8, 5, dtype=np.int64)})
    got = _run(tiles, 1)
    assert len(got) == 8
    assert (got["region_id"].to_numpy() == ids).all()
    assert (got["tile_count"].to_numpy() == 1).all()
    assert (got["total_n"].to_numpy() == 5).all()


def test_full_lattice_one_region(ray_session):
    n_cells = GRID.ppd * GRID.ppd
    tiles = pd.DataFrame({
        "tile_id": np.arange(n_cells, dtype=np.int64),
        "n": np.ones(n_cells, dtype=np.int64)})
    got = _run(tiles, 1)
    assert len(got) == 1
    r = got.iloc[0]
    assert r["region_id"] == 0
    assert r["tile_count"] == n_cells
    assert r["minx"] == GRID.minx and r["maxy"] == GRID.maxy
    assert r["maxx"] == GRID.minx + (float(GRID.ppd - 1) + 1.0) * GRID.cell_w


def test_star_path_parity(ray_session):
    """single_task_max_tiles=0 forces the alternating-star CC path —
    identical regions to the default single-task labeling."""
    import ray.data as rd
    tiles = _rand_tiles(13, 0.55)
    ds = rd.from_pandas(tiles).repartition(8)
    a = raster_regions(ds, GRID, 2, num_parts=16) \
        .to_pandas().sort_values("region_id").reset_index(drop=True)
    b = raster_regions(ds, GRID, 2, num_parts=16,
                       single_task_max_tiles=0) \
        .to_pandas().sort_values("region_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
