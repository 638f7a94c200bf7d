"""Grid cell math: explode, reference-point dedup, salting, Hilbert."""

import numpy as np

from hecatoncheir_ray.config import GridSpec
from hecatoncheir_ray.grid import (explode_cells, explode_cells_salted,
                                   point_cell, ref_point_key)
from hecatoncheir_ray.geometry.hilbert import d2xy, xy2d


GRID = GridSpec(0.0, 0.0, 10.0, 10.0, ppd=10)  # 1x1 cells


def test_point_cell():
    assert point_cell(GRID, np.array([0.5]), np.array([0.5]))[0] == 0
    assert point_cell(GRID, np.array([9.5]), np.array([9.5]))[0] == 99
    assert point_cell(GRID, np.array([2.5]), np.array([1.5]))[0] == 12
    # clamp out-of-space
    assert point_cell(GRID, np.array([-5.0]), np.array([50.0]))[0] == 90


def test_explode_cells():
    minx = np.array([0.5, 2.2])
    miny = np.array([0.5, 3.1])
    maxx = np.array([0.7, 4.9])
    maxy = np.array([0.7, 4.2])
    rows, cells = explode_cells(GRID, minx, miny, maxx, maxy)
    # row 0: single cell 0; row 1: x 2..4, y 3..4 -> 6 cells
    assert list(rows) == [0] + [1] * 6
    assert set(cells[rows == 1]) == {32, 33, 34, 42, 43, 44}


def test_ref_point_dedup_exactly_one_cell():
    rng = np.random.default_rng(0)
    for _ in range(200):
        r = rng.uniform(0, 9, 2)
        s = rng.uniform(0, 9, 2)
        rm = (r[0], r[1], r[0] + rng.uniform(0, 3), r[1] + rng.uniform(0, 3))
        sm = (s[0], s[1], s[0] + rng.uniform(0, 3), s[1] + rng.uniform(0, 3))
        # MBRs must overlap for the rule to apply
        if rm[2] < sm[0] or sm[2] < rm[0] or rm[3] < sm[1] or sm[3] < rm[1]:
            continue
        rx, ry = max(rm[0], sm[0]), max(rm[1], sm[1])
        own = ref_point_key(GRID, np.array([rx]), np.array([ry]), None, 4)[0]
        # the owning cell must be overlapped by both MBRs
        rr, rc = explode_cells(GRID, *[np.array([v]) for v in rm])
        sr, sc = explode_cells(GRID, *[np.array([v]) for v in sm])
        assert own in set(rc) and own in set(sc)


def test_salted_explode_partition_property():
    hot = np.array([55], dtype=np.int64)
    minx, miny = np.array([5.2]), np.array([5.3])
    maxx, maxy = np.array([5.9]), np.array([5.8])
    rows, cells = explode_cells_salted(GRID, minx, miny, maxx, maxy, hot, 4)
    assert (cells >= 100).all()          # all salted keys
    # the reference point key for a point in the MBR maps into emitted keys
    k = ref_point_key(GRID, np.array([5.5]), np.array([5.5]), hot, 4)[0]
    assert k in set(cells)
    # non-hot rows unchanged
    rows2, cells2 = explode_cells_salted(GRID, np.array([1.1]),
                                         np.array([1.1]), np.array([1.2]),
                                         np.array([1.2]), hot, 4)
    assert list(cells2) == [11]


def test_hilbert_roundtrip():
    n = 6
    d = np.arange(4 ** n)
    x, y = d2xy(n, d)
    np.testing.assert_array_equal(xy2d(n, x, y), d)
    # adjacency: consecutive d differ by one step
    dist = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (dist == 1).all()


def test_auto_ppd_sizing():
    """adjustPartitions analog (reference parse.cpp:165-178)."""
    from hecatoncheir_ray.config import EngineConfig
    cfg = EngineConfig(dataspace=(0, 0, 1, 1))
    assert cfg.with_auto_ppd(100).ppd == 16            # clamp floor
    assert cfg.with_auto_ppd(64 * 128 * 128).ppd == 128
    assert cfg.with_auto_ppd(10 ** 12).ppd == 4096     # clamp ceiling
    # reference nudge applied verbatim: ppd += (ppd % workers) + 1
    # (parse.cpp:170-172; does NOT guarantee ppd % workers == 1)
    p = cfg.with_auto_ppd(64 * 128 * 128, workers=10).ppd
    assert p == 128 + (128 % 10) + 1                   # 137
    p2 = cfg.with_auto_ppd(64 * 128 * 128, workers=127).ppd
    assert p2 == 128                                   # 128 % 127 == 1
    # result joins still correct at an auto ppd (smoke via grid build)
    assert cfg.with_auto_ppd(5000).make_grid().ppd >= 16
