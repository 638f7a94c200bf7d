"""Repeated-query index service vs the streaming pipelines."""

import numpy as np

import ray.data as rd

from hecatoncheir_ray.geometry import GT_BOX
from hecatoncheir_ray.pipelines.index_service import IndexedDataset
from hecatoncheir_ray.pipelines.knn import knn_query
from hecatoncheir_ray.pipelines.range_query import range_query
from hecatoncheir_ray.sources.synth import table_layer

BOUNDS = (0.0, 0.0, 100.0, 50.0)


def test_index_service_matches_pipelines(ray_session):
    tp = table_layer("points", 600, seed=44, bounds=BOUNDS)
    idx = IndexedDataset(rd.from_arrow(tp), num_shards=3)
    assert idx.count() == 600
    wins = [(0, GT_BOX, np.array([10.0, 10.0, 40.0, 30.0])),
            (1, GT_BOX, np.array([60.0, 5.0, 95.0, 45.0]))]
    got = idx.range_batch(wins)
    exp_rows = range_query(rd.from_arrow(tp), wins).take_all()
    exp = {0: [], 1: []}
    for r in exp_rows:
        exp[r["query_id"]].append(r["id"])
    assert got == {q: sorted(v) for q, v in exp.items()}

    queries = [(0, 25.0, 25.0), (1, 80.0, 10.0)]
    got_knn = idx.knn_batch(queries, k=5)
    exp_knn_rows = knn_query(rd.from_arrow(tp), queries, 5).take_all()
    exp_knn = {0: [], 1: []}
    for r in exp_knn_rows:
        exp_knn[r["query_id"]].append(r["id"])
    assert got_knn == exp_knn
    # second batch reuses the same built index (the ST1 point)
    got2 = idx.range_batch(wins)
    assert got2 == got
    idx.shutdown()
