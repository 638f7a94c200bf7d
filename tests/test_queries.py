"""Range / kNN / distance-join pipelines vs brute-force oracles."""

import numpy as np
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig
from hecatoncheir_ray.geometry import GT_BOX, GT_POLYGON, eval_predicate
from hecatoncheir_ray.pipelines.distance_join import distance_join
from hecatoncheir_ray.pipelines.knn import knn_query
from hecatoncheir_ray.pipelines.range_query import range_query
from hecatoncheir_ray.sources.synth import table_layer

BOUNDS = (0.0, 0.0, 100.0, 50.0)


def test_range_query_points(ray_session):
    tp = table_layer("points", 500, seed=20, bounds=BOUNDS)
    windows = [(0, GT_BOX, np.array([10.0, 10.0, 30.0, 30.0])),
               (1, GT_POLYGON, np.array([50, 0, 90, 0, 90, 40, 50, 40],
                                        dtype=float)),
               (2, GT_BOX, np.array([200.0, 200.0, 210.0, 210.0]))]  # empty
    got = range_query(rd.from_arrow(tp), windows).take_all()
    got = sorted((r["query_id"], r["id"]) for r in got)
    # oracle
    exp = []
    rows = tp.to_pylist()
    for qid, wgt, wc in windows:
        for a in rows:
            if eval_predicate("intersects", wgt, np.asarray(wc, float),
                              a["gtype"], np.asarray(a["coords"])):
                exp.append((qid, a["id"]))
    assert got == sorted(exp)
    # count mode (DataFrame, zero-filled)
    cdf = range_query(rd.from_arrow(tp), windows, mode="count")
    counts = dict(zip(cdf["query_id"], cdf["result_count"]))
    from collections import Counter
    expc = Counter(q for q, _ in exp)
    assert counts == {0: expc[0], 1: expc[1], 2: 0}


def test_range_query_polygons(ray_session):
    ts = table_layer("polygons", 150, seed=21, bounds=BOUNDS,
                     min_edge=2.0, max_edge=10.0, min_v=4, max_v=10)
    windows = [(0, GT_BOX, np.array([20.0, 5.0, 60.0, 45.0]))]
    got = sorted(r["id"] for r in
                 range_query(rd.from_arrow(ts), windows).take_all())
    wc = np.array([20.0, 5.0, 60.0, 45.0])
    exp = sorted(a["id"] for a in ts.to_pylist()
                 if eval_predicate("intersects", GT_BOX, wc, a["gtype"],
                                   np.asarray(a["coords"])))
    assert got == exp


def test_knn(ray_session):
    tp = table_layer("points", 800, seed=22, bounds=BOUNDS)
    queries = [(0, 25.0, 25.0), (1, 80.0, 10.0)]
    k = 7
    out = knn_query(rd.from_arrow(tp), queries, k).take_all()
    rows = tp.to_pylist()
    for qid, qx, qy in queries:
        got = sorted([(r["distance"], r["id"]) for r in out
                      if r["query_id"] == qid])
        dists = sorted((float(np.hypot(a["coords"][0] - qx,
                                       a["coords"][1] - qy)), a["id"])
                       for a in rows)[:k]
        assert [i for _, i in got] == [i for _, i in dists]
        np.testing.assert_allclose([d for d, _ in got],
                                   [d for d, _ in dists])


def test_distance_join(ray_session):
    tr = table_layer("points", 300, seed=23, bounds=BOUNDS)
    ts = table_layer("points", 300, seed=24, bounds=BOUNDS)
    d = 2.5
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8)
    got = sorted((r["r_id"], r["s_id"]) for r in
                 distance_join(rd.from_arrow(tr), rd.from_arrow(ts),
                               d, cfg).take_all())
    exp = []
    for a in tr.to_pylist():
        for b in ts.to_pylist():
            dx = a["coords"][0] - b["coords"][0]
            dy = a["coords"][1] - b["coords"][1]
            if dx * dx + dy * dy <= d * d:
                exp.append((a["id"], b["id"]))
    assert got == sorted(exp)
    assert len(got) > 0


def test_distance_join_large_eps_cross_cell(ray_session):
    """epsilon larger than a cell: replication must still find all pairs."""
    tr = table_layer("points", 80, seed=25, bounds=BOUNDS)
    ts = table_layer("points", 80, seed=26, bounds=BOUNDS)
    d = 15.0   # cells are 12.5 x 6.25 at ppd=8
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8)
    got = sorted((r["r_id"], r["s_id"]) for r in
                 distance_join(rd.from_arrow(tr), rd.from_arrow(ts),
                               d, cfg).take_all())
    exp = sorted((a["id"], b["id"])
                 for a in tr.to_pylist() for b in ts.to_pylist()
                 if (a["coords"][0] - b["coords"][0]) ** 2
                 + (a["coords"][1] - b["coords"][1]) ** 2 <= d * d)
    assert got == exp
