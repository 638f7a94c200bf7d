"""H3-style hex index: cube-rounding geometry, SQL-twin parity, packing,
and partitioning invariance of the counts reduce."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hecatoncheir_ray.pipelines.hexgrid import (hex_assignments, hex_axial,
                                                hex_center, hex_counts,
                                                hex_id, hex_sql)

SIZE = 0.5
_NBRS = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def _rand_pts(n, seed=11):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-125, -65, n), rng.uniform(24, 50, n))


def test_nearest_center_invariant():
    """Cube rounding must assign every point to the hex whose center is
    at least as close as any of the 6 neighbor centers (the defining
    property of a hex Voronoi assignment)."""
    x, y = _rand_pts(50000)
    q, r = hex_axial(x, y, SIZE)
    cx, cy = hex_center(q, r, SIZE)
    d0 = np.hypot(x - cx, y - cy)
    assert (d0 <= SIZE + 1e-12).all()          # circumradius bound
    for dq, dr in _NBRS:
        nx, ny = hex_center(q + dq, r + dr, SIZE)
        assert (d0 <= np.hypot(x - nx, y - ny) + 1e-12).all()


def test_sql_twin_bit_exact():
    x, y = _rand_pts(50000, seed=23)
    ids = hex_id(*hex_axial(x, y, SIZE))
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"x": x, "y": y}))
    got = con.execute(
        f"SELECT {hex_sql('x', 'y', SIZE)} AS h FROM pts").df()["h"]
    assert np.array_equal(ids, got.to_numpy().astype(np.int64))


def test_id_packing_roundtrip():
    rng = np.random.default_rng(3)
    q = rng.integers(-(1 << 19), 1 << 19, 1000)
    r = rng.integers(-(1 << 19), 1 << 19, 1000)
    h = hex_id(q, r)
    assert len(np.unique(h)) == len(np.unique(q * (1 << 21) + r))
    span = np.int64(1 << 21)
    assert np.array_equal(h // span - (1 << 20), q)
    assert np.array_equal(h % span - (1 << 20), r)


@pytest.mark.usefixtures("ray_session")
def test_counts_partition_invariance():
    """hex_counts is a shuffle-side reduce of per-batch sparse partials:
    the result must not depend on how the input is blocked."""
    x, y = _rand_pts(20000, seed=5)
    tbl = pd.DataFrame({"id": np.arange(len(x), dtype=np.int64),
                        "minx": x, "miny": y})

    def run(nblocks):
        ds = rd.from_pandas(tbl).repartition(nblocks)
        out = hex_counts(hex_assignments(ds, SIZE)).to_pandas()
        return out.sort_values("hex_id").reset_index(drop=True)

    a, b = run(1), run(64)
    pd.testing.assert_frame_equal(a, b)
    q, r = hex_axial(x, y, SIZE)
    exp = pd.Series(hex_id(q, r)).value_counts().sort_index()
    assert np.array_equal(a["hex_id"].to_numpy(), exp.index.to_numpy())
    assert np.array_equal(a["n"].to_numpy(), exp.to_numpy())
