"""Derived octagon / polyline layers: SQL↔numpy bit-exactness, geometric
invariants, and Ray-join vs DuckDB-oracle pair parity (the driver gate's
mechanism, at sf0.001 for speed)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from hecatoncheir_ray.sources import derive as d

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "part", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_octagon_sql_np_bit_exact(con):
    sql = d.sql_octagon_vertices(d.sql_boxes_orders(), "id", d.ORDERS_SALT)
    df = con.execute(f"SELECT * FROM ({sql}) ORDER BY id, i").df()
    keys = np.sort(df["id"].unique())
    xs, ys, *_ = d.octagons_np(keys, d.ORDERS_SALT)
    assert np.array_equal(xs, df["x"].to_numpy().reshape(-1, 8).T)
    assert np.array_equal(ys, df["y"].to_numpy().reshape(-1, 8).T)


def test_octagon_shrunk_sql_np_bit_exact(con):
    sql = d.sql_octagon_vertices(d.sql_boxes_part_oct(), "id", d.PART_SALT)
    df = con.execute(f"SELECT * FROM ({sql}) ORDER BY id, i").df()
    keys = np.sort(df["id"].unique())
    xs, ys, *_ = d.octagons_np(keys, d.PART_SALT, d.OCT_S_SHRINK)
    assert np.array_equal(xs, df["x"].to_numpy().reshape(-1, 8).T)
    assert np.array_equal(ys, df["y"].to_numpy().reshape(-1, 8).T)


def test_octagons_convex_ccw_mbr_is_box():
    keys = np.arange(1, 5000, dtype=np.int64)
    xs, ys, minx, miny, maxx, maxy = d.octagons_np(keys, d.ORDERS_SALT)
    P = np.stack([xs, ys], axis=-1)
    e = np.roll(P, -1, axis=0) - P
    e2 = np.roll(e, -1, axis=0)
    cross = e[:, :, 0] * e2[:, :, 1] - e[:, :, 1] * e2[:, :, 0]
    assert (cross > 0).all()                       # strictly convex, CCW
    assert np.array_equal(xs.min(axis=0), minx)    # MBR == base box
    assert np.array_equal(xs.max(axis=0), maxx)
    assert np.array_equal(ys.min(axis=0), miny)
    assert np.array_equal(ys.max(axis=0), maxy)


def test_lines_sql_np_bit_exact_and_monotone(con):
    df = con.execute(f"SELECT * FROM ({d.sql_line_vertices()}) "
                     f"ORDER BY id, i").df()
    keys = np.sort(df["id"].unique())
    xv, yv = d.lines_np(keys)
    assert np.array_equal(xv, df["x"].to_numpy().reshape(-1, d.LINE_NV).T)
    assert np.array_equal(yv, df["y"].to_numpy().reshape(-1, d.LINE_NV).T)
    assert (np.diff(xv, axis=0) > 0).all()         # x-monotone => simple


def test_key_collision_pairs_are_strict_containment():
    """o_orderkey + 17 == p_partkey + 7919 pairs share the full hash key;
    the 0.9-shrunk part octagon must then sit strictly inside the orders
    one (generic position is preserved by construction, not luck)."""
    pk = np.arange(1, 200, dtype=np.int64)
    ok = pk + d.PART_SALT - d.ORDERS_SALT
    rx, ry, *_ = d.octagons_np(ok, d.ORDERS_SALT)
    sx, sy, *_ = d.octagons_np(pk, d.PART_SALT, d.OCT_S_SHRINK)
    # every shrunk vertex strictly inside the outer ring (convex CCW test)
    ax, ay = np.roll(rx, -1, axis=0) - rx, np.roll(ry, -1, axis=0) - ry
    for v in range(8):
        cr = ax * (sy[v][None, :] - ry) - ay * (sx[v][None, :] - rx)
        assert (cr > 0).all()


def _pairs(res) -> set:
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    return set(map(tuple, df[["r_id", "s_id"]].to_numpy().tolist()))


def test_poly_queries_match_sql_oracles(ray_session, con):
    import __ray_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    for name in ("poly_join_pairs", "poly_line_join_pairs"):
        got = _pairs(qs[name](SF))
        want = set(map(tuple,
                       con.execute(osql[name]).df().to_numpy().tolist()))
        assert got == want, f"{name}: {len(got)} vs {len(want)}"
    hist = qs["poly_find_relation_counts"](SF)
    want = con.execute(osql["poly_find_relation_counts"]).df()
    a = hist.sort_values("relation_name").reset_index(drop=True)
    b = want.sort_values("relation_name").reset_index(drop=True)
    assert list(a["relation_name"]) == list(b["relation_name"])
    assert list(a["pair_count"]) == list(b["pair_count"])
