"""Compatibility facade: the reference's QueryTest driver flow, ported
nearly line-for-line through hecatoncheir_ray.api."""

import os

import pytest

from hecatoncheir_ray.api import (DistanceJoinQuery, Hecatoncheir, KNNQuery,
                                  PredicateJoinQuery, QR_COLLECT, QR_COUNT)

SAMPLES = "/root/reference/Hecatoncheir/test/samples"

pytestmark = pytest.mark.skipif(not os.path.isdir(SAMPLES),
                                reason="reference samples not available")


def test_reference_driver_flow(ray_session):
    eng = Hecatoncheir()
    # prepareDataset / partition / buildIndex
    r = eng.prepare_dataset(f"{SAMPLES}/data_sample_polygons_1.wkt",
                            "WKT", "POLYGON")
    s = eng.prepare_dataset(f"{SAMPLES}/data_sample_polygons_2.wkt",
                            "WKT", "POLYGON")
    assert (r, s) == (0, 1)
    assert eng.partition([r, s]) == 0
    assert eng.build_index([r, s], "two_layer") == 0
    # find_relation COUNT (QueryTest::test1)
    hist = eng.query(PredicateJoinQuery(r, s, 0, "find_relation", QR_COUNT))
    d = dict(zip(hist["relation_name"], hist["pair_count"]))
    assert d == {"intersect": 4, "inside": 1}
    # intersection COLLECT (test2)
    pairs = eng.query(PredicateJoinQuery(r, s, 0, "intersects", QR_COLLECT))
    assert len(pairs) == 5
    eng.unload_dataset(r)
    eng.unload_dataset(s)

    # batch kNN (test4)
    p = eng.prepare_dataset(f"{SAMPLES}/data_sample_points.wkt",
                            "WKT", "POINT")
    eng.partition([p])
    batch = eng.load_knn_queries_from_file(
        f"{SAMPLES}/query_sample_points.wkt", "WKT", p, k=2)
    assert len(batch) == 2
    res = eng.query_batch(batch)
    assert res[0] == [33, 31] and res[1] == [53, 58]

    # batch range COUNT (test5)
    rbatch = eng.load_range_queries_from_file(
        f"{SAMPLES}/query_sample_polygons.wkt", "WKT", p, QR_COUNT)
    res = eng.query_batch(rbatch)
    assert res[0] == 0 and res[1] == 1

    # distance join (test7)
    q = eng.prepare_dataset(f"{SAMPLES}/query_sample_points.wkt",
                            "WKT", "POINT")
    eng.partition([p, q])
    n = eng.query(DistanceJoinQuery(p, q, 0, QR_COUNT, 7.65))
    assert n == 5


def test_index_type_equivalence(ray_session):
    """IT_TWO_LAYER and IT_UNIFORM_GRID are two traversals of the same
    partitioning (reference containers.h:1998-2107); here both flags map
    to the one groupby(cell) + reference-point plan.  Pin that the flag
    changes nothing on the reference's own golden scenarios, and that
    unknown flags are rejected (no silent string acceptance)."""
    results = {}
    for it in ("two_layer", "uniform_grid", "IT_UNIFORM_GRID"):
        eng = Hecatoncheir()
        r = eng.prepare_dataset(f"{SAMPLES}/data_sample_polygons_1.wkt",
                                "WKT", "POLYGON")
        s = eng.prepare_dataset(f"{SAMPLES}/data_sample_polygons_2.wkt",
                                "WKT", "POLYGON")
        eng.partition([r, s])
        assert eng.build_index([r, s], it) == 0
        hist = eng.query(PredicateJoinQuery(r, s, 0, "find_relation",
                                            QR_COUNT))
        pairs = eng.query(PredicateJoinQuery(r, s, 0, "intersects",
                                             QR_COLLECT))
        p = eng.prepare_dataset(f"{SAMPLES}/data_sample_points.wkt",
                                "WKT", "POINT")
        eng.partition([p])
        eng.build_index([p], it)
        knn = eng.query_batch(eng.load_knn_queries_from_file(
            f"{SAMPLES}/query_sample_points.wkt", "WKT", p, k=2))
        results[it] = (
            sorted(zip(hist["relation_name"], hist["pair_count"])),
            sorted(zip(pairs["r_id"], pairs["s_id"])),
            {k: list(v) for k, v in knn.items()})
    assert results["two_layer"] == results["uniform_grid"]
    assert results["two_layer"] == results["IT_UNIFORM_GRID"]

    eng = Hecatoncheir()
    with pytest.raises(ValueError, match="unknown index type"):
        eng.build_index([], "rtree")


def test_query_wire_roundtrip():
    """pack_query/unpack_query (Query::createFromBuffer analog,
    reference API/containers.h:312): every query dataclass survives the
    wire byte-exact, including float64 range coords; truncated buffers
    and unknown kinds raise."""
    import numpy as np
    from hecatoncheir_ray.api import (RangeQuery, pack_query,
                                      unpack_query)
    qs = [PredicateJoinQuery(0, 1, 7, "intersects", QR_COUNT),
          RangeQuery(3, 2, np.array([0.25, -1.5, 9.75, 4.125]), 0),
          KNNQuery(5, -100.25, 35.5, 1, k=4),
          DistanceJoinQuery(0, 1, 2, QR_COLLECT, 7.65)]
    for q in qs:
        r = unpack_query(pack_query(q))
        assert type(r) is type(q)
        if isinstance(q, RangeQuery):
            assert (r.coords == q.coords).all()
            assert r.coords.dtype == np.float64
            d1, d2 = dict(q.__dict__), dict(r.__dict__)
            d1.pop("coords"), d2.pop("coords")
            assert d1 == d2
        else:
            assert r == q
    with pytest.raises(ValueError, match="truncated"):
        unpack_query(pack_query(qs[0])[:-3])
    with pytest.raises(ValueError, match="unknown query kind"):
        unpack_query(pack_query(qs[0]).replace(
            b"PredicateJoinQuery", b"MysteryQueryXXXXXX"))
    with pytest.raises(TypeError):
        pack_query(object())
