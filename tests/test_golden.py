"""Golden-output parity with the reference test suite.

The seven QueryTest scenarios (/root/reference/Hecatoncheir/test/classes/
QueryTest.cpp) run against the reference's own sample WKT files (read
directly from the read-only reference tree) with the reference's expected
outputs.  recID = 0-based line number, as in the reference loader.
"""

import os

import numpy as np
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig, spatial_join
from hecatoncheir_ray.geometry.predicates import (TR_CONTAINS, TR_COVERED_BY,
                                                  TR_COVERS, TR_DISJOINT,
                                                  TR_EQUAL, TR_INSIDE,
                                                  TR_INTERSECT, TR_MEET)
from hecatoncheir_ray.pipelines.distance_join import distance_join
from hecatoncheir_ray.pipelines.knn import knn_query
from hecatoncheir_ray.pipelines.range_query import range_query
from hecatoncheir_ray.sources.readers import load_wkt_table

SAMPLES = "/root/reference/Hecatoncheir/test/samples"

pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLES),
                                reason="reference samples not available")


def _cfg():
    return EngineConfig(ppd=8)   # dataspace auto-computed from the data


def _load(name, dtype):
    return load_wkt_table(f"{SAMPLES}/{name}", dtype)


def test1_find_relation_counts(ray_session):
    r = rd.from_arrow(_load("data_sample_polygons_1.wkt", "POLYGON"))
    s = rd.from_arrow(_load("data_sample_polygons_2.wkt", "POLYGON"))
    rel = spatial_join(r, s, "find_relation", _cfg()).take_all()
    counts = np.zeros(8, dtype=int)
    for row in rel:
        counts[row["relation"]] += 1
    # QueryTest.cpp:28-35
    assert counts[TR_DISJOINT] == 0
    assert counts[TR_INTERSECT] == 4
    assert counts[TR_INSIDE] == 1
    assert counts[TR_CONTAINS] == 0
    assert counts[TR_COVERED_BY] == 0
    assert counts[TR_COVERS] == 0
    assert counts[TR_EQUAL] == 0
    assert counts[TR_MEET] == 0


def test2_intersection_join_collect(ray_session):
    r = rd.from_arrow(_load("data_sample_polygons_1.wkt", "POLYGON"))
    s = rd.from_arrow(_load("data_sample_polygons_2.wkt", "POLYGON"))
    pairs = spatial_join(r, s, "intersects", _cfg()).take_all()
    assert len(pairs) == 5      # QueryTest.cpp:68


def test3_poly_line_join_empty(ray_session):
    r = rd.from_arrow(_load("data_sample_polygons_1.wkt", "POLYGON"))
    s = rd.from_arrow(_load("data_sample_linestrings.wkt", "LINESTRING"))
    pairs = spatial_join(r, s, "intersects", _cfg()).take_all()
    assert len(pairs) == 0      # QueryTest.cpp:100


def test4_batch_knn(ray_session):
    pts = rd.from_arrow(_load("data_sample_points.wkt", "POINT"))
    qt = _load("query_sample_points.wkt", "POINT")
    queries = [(int(row["id"]), row["coords"][0], row["coords"][1])
               for row in qt.to_pylist()]
    out = knn_query(pts, queries, k=2).take_all()
    by_q = {}
    for row in out:
        by_q.setdefault(row["query_id"], []).append(row["id"])
    # QueryTest.cpp:138-150 (ordered by distance)
    assert by_q[0] == [33, 31]
    assert by_q[1] == [53, 58]


def test5_batch_range_count_points(ray_session):
    pts = rd.from_arrow(_load("data_sample_points.wkt", "POINT"))
    qt = _load("query_sample_polygons.wkt", "POLYGON")
    wins = [(int(r["id"]), 3, np.asarray(r["coords"]))
            for r in qt.to_pylist()]
    cdf = range_query(pts, wins, mode="count")
    counts = dict(zip(cdf["query_id"], cdf["result_count"]))
    assert counts[0] == 0 and counts[1] == 1    # QueryTest.cpp:184-189


def test6_batch_range_collect_polygons(ray_session):
    polys = rd.from_arrow(_load("data_sample_polygons_2.wkt", "POLYGON"))
    qt = _load("query_sample_polygons.wkt", "POLYGON")
    wins = [(int(r["id"]), 3, np.asarray(r["coords"]))
            for r in qt.to_pylist()]
    hits = range_query(polys, wins).take_all()
    assert len(hits) == 0       # QueryTest.cpp:224-229 (0 and 0)


def test7_distance_join(ray_session):
    r = rd.from_arrow(_load("data_sample_points.wkt", "POINT"))
    s = rd.from_arrow(_load("query_sample_points.wkt", "POINT"))
    pairs = distance_join(r, s, 7.65, _cfg()).take_all()
    assert len(pairs) == 5      # QueryTest.cpp:260
