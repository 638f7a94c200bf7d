"""Exact distributed kNN join (pipelines/knn_join.py) vs brute force."""

import numpy as np
import pytest

from hecatoncheir_ray.config import EngineConfig
from hecatoncheir_ray.pipelines.knn_join import knn_join
from hecatoncheir_ray.sources.synth import synth_points

B = (0.0, 0.0, 32.0, 32.0)


def _brute(rx, ry, rid, sx, sy, sid, k):
    want = {}
    for i in range(len(rid)):
        d2 = (rx[i] - sx) ** 2 + (ry[i] - sy) ** 2
        order = np.lexsort((sid, d2))[:k]
        want[int(rid[i])] = [int(sid[j]) for j in order]
    return want


def _run(r_t, s_t, k, ppd):
    import ray.data as rd
    cfg = EngineConfig(dataspace=B, ppd=ppd)
    out = knn_join(rd.from_arrow(r_t), rd.from_arrow(s_t), k, cfg) \
        .to_pandas().sort_values(["r_id", "rank"])
    got = {}
    for rid, g in out.groupby("r_id"):
        got[int(rid)] = g["s_id"].tolist()
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
    return got


@pytest.mark.parametrize("ppd", [8, 64])
def test_knn_join_matches_brute(ray_session, ppd):
    """ppd=8: dense cells, mostly pass-1-resolved; ppd=64: sparse cells
    (~0.5 points each), exercises the radius-doubling unknown path."""
    r_ids = np.arange(300, dtype=np.int64)
    s_ids = np.arange(2000, dtype=np.int64) + 10_000
    r_t = synth_points(r_ids, seed=21, bounds=B)
    s_t = synth_points(s_ids, seed=22, bounds=B)
    got = _run(r_t, s_t, 3, ppd)
    rx = r_t["minx"].to_numpy(zero_copy_only=False)
    ry = r_t["miny"].to_numpy(zero_copy_only=False)
    sx = s_t["minx"].to_numpy(zero_copy_only=False)
    sy = s_t["miny"].to_numpy(zero_copy_only=False)
    want = _brute(rx, ry, r_ids, sx, sy, s_ids, 3)
    assert got == want


def test_knn_join_self(ray_session):
    """r == s: every point's nearest neighbour is itself (rank 1)."""
    ids = np.arange(500, dtype=np.int64)
    t = synth_points(ids, seed=31, bounds=B)
    got = _run(t, t, 2, 16)
    x = t["minx"].to_numpy(zero_copy_only=False)
    y = t["miny"].to_numpy(zero_copy_only=False)
    want = _brute(x, y, ids, x, y, ids, 2)
    assert got == want
    assert all(v[0] == rid for rid, v in got.items())
