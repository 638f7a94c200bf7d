"""Quadkey tile pyramid (pipelines/tiling.py): interleave properties,
parent-child consistency, and Ray vs DuckDB bit-parity at sf0.001."""

import duckdb
import numpy as np

from hecatoncheir_ray.config import TIGER_US_BOUNDS
from hecatoncheir_ray.pipelines.tiling import (pyramid_counts,
                                               pyramid_counts_sql, quadkey,
                                               quadkey_sql)
from hecatoncheir_ray.sources import derive

SF = "/root/testdata/sf0.001"
B = TIGER_US_BOUNDS


def test_quadkey_interleave_and_hierarchy():
    rng_x = np.linspace(B[0], B[2], 257)[:-1]
    rng_y = np.linspace(B[1], B[3], 257)[:-1]
    q8 = quadkey(rng_x, rng_y, B, 8)
    q7 = quadkey(rng_x, rng_y, B, 7)
    assert (q8 >> 2 == q7).all()             # parent = child >> 2
    assert quadkey(np.array([B[0]]), np.array([B[1]]), B, 8)[0] == 0
    # top-right corner point clamps into the last tile = all-ones key
    q = quadkey(np.array([B[2]]), np.array([B[3]]), B, 4)[0]
    assert q == (1 << 8) - 1
    assert q8.max() < (1 << 16) and q8.min() >= 0


def test_quadkey_sql_twin_bit_exact():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    px, py = derive.points_sql("event_id")
    df = con.execute(
        f"SELECT event_id, {quadkey_sql(px, py, B, 8)} AS qk FROM events "
        f"ORDER BY event_id").df()
    x, y = derive.points_np(df["event_id"].to_numpy())
    assert np.array_equal(quadkey(x, y, B, 8), df["qk"].to_numpy())


def test_pyramid_counts_matches_oracle(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    px, py = derive.points_sql("event_id")
    want = con.execute(pyramid_counts_sql(px, py, "FROM events", B, 6)) \
        .df().sort_values(["zoom", "qk"]).reset_index(drop=True)
    got = pyramid_counts(derive.ray_points_events(SF), B, 6).to_pandas() \
        .sort_values(["zoom", "qk"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got[["zoom", "qk", "n"]].to_numpy()
            == want[["zoom", "qk", "n"]].to_numpy()).all()
    # zoom-0 row is the total point count
    z0 = got[got["zoom"] == 0]
    assert len(z0) == 1 and int(z0["n"].iloc[0]) == 1000
