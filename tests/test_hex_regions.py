"""hex_regions (hex-lattice polygonize): 6-neighbor components vs a
brute-force union-find oracle and the recursive-CTE DuckDB twin.
"""

import duckdb
import numpy as np
import pandas as pd

from hecatoncheir_ray.pipelines.hexgrid import (_OFF, _SPAN, hex_center,
                                                hex_id, hex_regions,
                                                hex_regions_sql)

SIZE = 0.5


def _rand_cells(seed: int, frac: float, span: int = 24) -> pd.DataFrame:
    """Sparse hex raster over a span x span axial window."""
    rng = np.random.RandomState(seed)
    qq, rr = np.meshgrid(np.arange(span), np.arange(span))
    keep = rng.rand(span * span) < frac
    q = qq.ravel()[keep].astype(np.int64) - span // 2
    r = rr.ravel()[keep].astype(np.int64) - span // 2
    return pd.DataFrame({"hex_id": hex_id(q, r),
                         "n": rng.randint(1, 9, keep.sum())
                         .astype(np.int64)})


def _brute(cells: pd.DataFrame, threshold: int) -> pd.DataFrame:
    kept = cells[cells["n"] >= threshold]
    ids = kept["hex_id"].to_numpy().astype(np.int64)
    ns = kept["n"].to_numpy().astype(np.int64)
    parent = {int(h): int(h) for h in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    s = set(parent)
    for h in list(s):
        for d in (_SPAN, 1, _SPAN - 1):
            if h + d in s:
                ra, rb = find(h), find(h + d)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    rows = {}
    for h, n in zip(ids.tolist(), ns.tolist()):
        root = find(h)
        q = h // _SPAN - _OFF
        r = h % _SPAN - _OFF
        cx, cy = hex_center(np.array([q]), np.array([r]), SIZE)
        cx, cy = float(cx[0]), float(cy[0])
        agg = rows.setdefault(root, [0, 0, cx, cx, cy, cy])
        agg[0] += 1
        agg[1] += n
        agg[2] = min(agg[2], cx)
        agg[3] = max(agg[3], cx)
        agg[4] = min(agg[4], cy)
        agg[5] = max(agg[5], cy)
    return pd.DataFrame(
        [{"region_id": k, "cell_count": a[0], "total_n": a[1],
          "minx": a[2], "maxx": a[3], "miny": a[4], "maxy": a[5]}
         for k, a in rows.items()]).sort_values("region_id") \
        .reset_index(drop=True)


def _run(cells: pd.DataFrame, threshold: int, blocks: int = 4, **kw):
    import ray.data as rd
    ds = rd.from_pandas(cells).repartition(blocks)
    got = hex_regions(ds, SIZE, threshold, num_parts=16, **kw).to_pandas()
    return got.sort_values("region_id").reset_index(drop=True)


def test_vs_union_find(ray_session):
    for seed, frac, thr in ((1, 0.6, 1), (2, 0.35, 3)):
        cells = _rand_cells(seed, frac)
        got = _run(cells, thr)
        want = _brute(cells, thr)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)],
            check_exact=True)
        assert len(want) > 0


def test_vs_sql_twin(ray_session):
    cells = _rand_cells(7, 0.5)
    got = _run(cells, 2)
    con = duckdb.connect()
    con.register("cells_src", cells)
    want = con.execute(hex_regions_sql(
        "SELECT hex_id, n FROM cells_src", SIZE, 2)).df() \
        .sort_values("region_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, check_exact=True)


def test_star_path_parity(ray_session):
    cells = _rand_cells(9, 0.55)
    a = _run(cells, 1)
    b = _run(cells, 1, single_task_max_cells=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_partitioning_invariance_and_empty(ray_session):
    import ray.data as rd
    cells = _rand_cells(4, 0.5)
    a = _run(cells, 1, blocks=1)
    b = _run(cells, 1, blocks=16)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    empty = hex_regions(rd.from_pandas(cells), SIZE, 10 ** 6, num_parts=8)
    assert empty.count() == 0
    assert "region_id" in empty.schema().names
