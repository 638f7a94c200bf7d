"""Hash-salting skew strategy (grid.explode_cells_hash_salted +
cfg.skew_strategy="salt"): exactly-once pairing, degenerate-stacking
group-size caps, and join-result parity with the split strategy and a
brute-force oracle."""

import numpy as np
import pyarrow as pa

from hecatoncheir_ray.config import EngineConfig, GridSpec
from hecatoncheir_ray.grid import (_salt_key, explode_cells_hash_salted,
                                   explode_cells_salted)

B = (0.0, 0.0, 16.0, 16.0)


def _grid(ppd=16):
    return GridSpec(*B, ppd=ppd)


def test_hash_salt_exactly_once_pairing():
    """Every (r, s) pair of hot-cell rows co-occurs in exactly one bucket."""
    g = _grid()
    n = 40
    # all rows identical MBR inside cell (0,0) => degenerate stacking
    minx = np.full(n, 0.4)
    miny = np.full(n, 0.4)
    maxx = np.full(n, 0.6)
    maxy = np.full(n, 0.6)
    ids = np.arange(n, dtype=np.int64)
    hot = np.array([0], dtype=np.int64)
    f = 4
    rr, rc = explode_cells_hash_salted(g, minx, miny, maxx, maxy,
                                       ids, 0, hot, f)
    sr, sc = explode_cells_hash_salted(g, minx, miny, maxx, maxy,
                                       ids + 1000, 1, hot, f)
    assert len(rr) == n * f and len(sr) == n * f   # f replicas each
    # bucket co-occurrence count per (r, s) pair must be exactly 1
    from collections import defaultdict
    r_by_key = defaultdict(set)
    for row, key in zip(rr, rc):
        r_by_key[key].add(row)
    s_by_key = defaultdict(set)
    for row, key in zip(sr, sc):
        s_by_key[key].add(row)
    seen = defaultdict(int)
    for key in set(r_by_key) | set(s_by_key):
        for i in r_by_key[key]:
            for j in s_by_key[key]:
                seen[(i, j)] += 1
    assert len(seen) == n * n
    assert set(seen.values()) == {1}
    # group sizes capped: each bucket holds ~n/f rows per side (hash
    # variance allows some imbalance, but nothing near the full n)
    for key in r_by_key:
        assert len(r_by_key[key]) <= 2 * (n // f)
    # geometric splitting CANNOT separate this layer: identical MBRs all
    # replicate to the same sub-cells, so every sub-cell group still
    # holds every row (size n) — only hash-salting caps it
    gr, gc = explode_cells_salted(g, minx, miny, maxx, maxy, hot, f)
    for key in set(gc.tolist()):
        assert (gc == key).sum() == n


def test_salt_join_matches_split_and_brute(ray_session):
    import ray.data as rd
    from hecatoncheir_ray import spatial_join
    from hecatoncheir_ray.sources.synth import synth_points

    rng_ids = np.arange(3000, dtype=np.int64)
    pts = synth_points(rng_ids, seed=9, bounds=B)
    # stack 1500 of the points onto one coordinate (degenerate hot spot)
    x = pts["minx"].to_numpy(zero_copy_only=False).copy()
    y = pts["miny"].to_numpy(zero_copy_only=False).copy()
    x[:1500] = 3.3
    y[:1500] = 3.3
    flat = np.empty(2 * len(x))
    flat[0::2] = x
    flat[1::2] = y
    offs = np.arange(0, 2 * len(x) + 1, 2, dtype=np.int32)
    stacked = pa.table({
        "id": pts["id"], "gtype": pts["gtype"],
        "coords": pa.ListArray.from_arrays(pa.array(offs),
                                           pa.array(flat)),
        "minx": pa.array(x), "miny": pa.array(y),
        "maxx": pa.array(x), "maxy": pa.array(y)})
    # boxes layer, a few covering the hot spot
    k = np.arange(400, dtype=np.int64)
    bx = (k % 20).astype(float) * 0.8
    by = (k // 20).astype(float) * 0.8
    boxes = pa.table({
        "id": pa.array(k + 10_000), "gtype": pa.array(
            np.full(400, 4, np.int8)),
        "coords": pa.ListArray.from_arrays(
            pa.array(np.arange(0, 1604, 4, dtype=np.int32)),
            pa.array(np.stack([bx, by, bx + 1.0, by + 1.0],
                              axis=1).ravel())),
        "minx": pa.array(bx), "miny": pa.array(by),
        "maxx": pa.array(bx + 1.0), "maxy": pa.array(by + 1.0)})

    def pairs(strategy):
        cfg = EngineConfig(dataspace=B, ppd=16, hot_cell_rows=64,
                           salt_factor=4, skew_strategy=strategy)
        out = spatial_join(rd.from_arrow(stacked), rd.from_arrow(boxes),
                           "covered_by", cfg).to_pandas()
        return set(map(tuple, out[["r_id", "s_id"]].to_numpy().tolist()))

    got_salt = pairs("salt")
    got_split = pairs("split")
    # brute force oracle
    want = set()
    for i in range(3000):
        sel = (x[i] >= bx) & (x[i] <= bx + 1.0) \
            & (y[i] >= by) & (y[i] <= by + 1.0)
        for j in np.nonzero(sel)[0]:
            want.add((int(rng_ids[i]), int(k[j] + 10_000)))
    assert got_salt == want
    assert got_split == want


def test_salt_key_spaces_disjoint():
    g = _grid()
    cells = np.array([0, 5, 255], dtype=np.int64)
    subs = np.array([0, 7, 15], dtype=np.int64)
    keys = _salt_key(g, cells, subs, 4)
    assert (keys >= g.ppd * g.ppd).all()
