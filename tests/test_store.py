"""Partitioned spatial store: fragment pruning for range + kNN
(VERDICT r1 'What's missing' #1/#2; reference range_filter.cpp /
knn_filter.cpp pruning semantics)."""

import numpy as np
import pytest
import ray.data as rd

from hecatoncheir_ray.config import GridSpec, TIGER_US_BOUNDS
from hecatoncheir_ray.geometry.core import GT_BOX
from hecatoncheir_ray.sources.store import (build_manifest,
                                            knn_prune_fragments,
                                            knn_query_store,
                                            prune_fragments_mbr,
                                            range_query_store,
                                            write_spatial)
from hecatoncheir_ray.sources.synth import ray_layer, table_layer


@pytest.fixture(scope="module")
def point_store(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("store") / "points")
    grid = GridSpec(*TIGER_US_BOUNDS, ppd=64)
    ds = ray_layer("points", 20000, seed=11)
    write_spatial(ds, out, grid, group_shift=4)
    return out, grid


def test_manifest_covers_all_rows(point_store):
    out, _ = point_store
    man = build_manifest(out)
    assert sum(f["rows"] for f in man) == 20000
    assert len(man) > 8          # actually partitioned
    for f in man:
        assert f["minx"] <= f["maxx"] and f["miny"] <= f["maxy"]


def test_range_store_prunes_and_matches(point_store, ray_session):
    out, _ = point_store
    x0, y0, x1, y1 = (-100.0, 30.0, -95.0, 35.0)
    win = [(7, GT_BOX, np.array([x0, y0, x1, y1]))]
    man = build_manifest(out)
    pruned = prune_fragments_mbr(out, np.array([[x0, y0, x1, y1]]))
    assert 0 < len(pruned) < len(man)    # the point of the feature

    got = range_query_store(out, win, mode="count")
    # brute force over the full layer
    t = table_layer("points", 20000, seed=11)
    px = t["minx"].to_numpy()
    py = t["miny"].to_numpy()
    n = int(((px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)).sum())
    assert got.loc[got["query_id"] == 7, "result_count"].iloc[0] == n
    assert n > 0


def test_knn_store_prunes_and_matches(point_store, ray_session):
    from hecatoncheir_ray.pipelines.knn import knn_query
    out, _ = point_store
    queries = [(0, -100.0, 38.0), (1, -80.0, 30.0)]
    k = 15
    man = build_manifest(out)
    pruned = knn_prune_fragments(out, queries, k)
    assert 0 < len(pruned) < len(man)

    got = knn_query_store(out, queries, k).to_pandas() \
        .sort_values(["query_id", "distance", "id"]).reset_index(drop=True)
    full = knn_query(rd.from_arrow(table_layer("points", 20000, seed=11)),
                     queries, k).to_pandas() \
        .sort_values(["query_id", "distance", "id"]).reset_index(drop=True)
    assert len(got) == len(full) == 2 * k
    assert (got["id"].to_numpy() == full["id"].to_numpy()).all()
    np.testing.assert_allclose(got["distance"], full["distance"])


def test_knn_prune_keeps_all_when_k_huge(point_store):
    out, _ = point_store
    man = build_manifest(out)
    pruned = knn_prune_fragments(out, [(0, -100.0, 38.0)], 10 ** 9)
    assert len(pruned) == len(man)


def test_range_store_empty_window(point_store, ray_session):
    out, _ = point_store
    win = [(3, GT_BOX, np.array([500.0, 500.0, 501.0, 501.0]))]
    got = range_query_store(out, win, mode="count")
    assert got["result_count"].iloc[0] == 0
