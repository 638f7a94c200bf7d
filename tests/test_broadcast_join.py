"""Broadcast (zero-shuffle, small-S) spatial join vs the shuffle path.

The broadcast path must produce the IDENTICAL pair / relation set as
spatial_join for every predicate — same candidate rule (grid buckets +
MBR test), same refinement kernels, different physical plan (S pinned as
block refs, R streamed unshuffled).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig, spatial_join
from hecatoncheir_ray.pipelines.spatial_join import spatial_join_broadcast
from hecatoncheir_ray.sources.synth import table_layer

BOUNDS = (0.0, 0.0, 100.0, 50.0)


def _cfg(**kw):
    return EngineConfig(dataspace=BOUNDS, ppd=8,
                        intermediate_filter=False, **kw)


def _pairs(ds):
    return sorted((r["r_id"], r["s_id"]) for r in ds.take_all())


@pytest.mark.parametrize("predicate", ["intersects", "covered_by",
                                       "contains", "disjoint"])
def test_broadcast_matches_shuffle_poly(ray_session, predicate):
    tr = table_layer("polygons", 220, seed=31, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    ts = table_layer("polygons", 60, seed=32, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    got = _pairs(spatial_join_broadcast(rd.from_arrow(tr),
                                        rd.from_arrow(ts),
                                        predicate, _cfg(), concurrency=2))
    exp = _pairs(spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                              predicate, _cfg()))
    assert got == exp


def test_broadcast_matches_shuffle_points(ray_session):
    tp = table_layer("points", 900, seed=33, bounds=BOUNDS)
    ts = table_layer("polygons", 50, seed=34, bounds=BOUNDS,
                     min_edge=3.0, max_edge=12.0, min_v=4, max_v=10)
    got = _pairs(spatial_join_broadcast(rd.from_arrow(tp),
                                        rd.from_arrow(ts),
                                        "covered_by", _cfg(),
                                        concurrency=2))
    exp = _pairs(spatial_join(rd.from_arrow(tp), rd.from_arrow(ts),
                              "covered_by", _cfg()))
    assert got == exp
    assert len(got) > 0


def test_broadcast_find_relation(ray_session):
    tr = table_layer("boxes", 150, seed=35, bounds=BOUNDS,
                     min_edge=2.0, max_edge=10.0)
    ts = table_layer("boxes", 40, seed=36, bounds=BOUNDS,
                     min_edge=2.0, max_edge=10.0)
    got = sorted((r["r_id"], r["s_id"], r["relation"]) for r in
                 spatial_join_broadcast(rd.from_arrow(tr),
                                        rd.from_arrow(ts),
                                        "find_relation", _cfg(),
                                        concurrency=2).take_all())
    exp = sorted((r["r_id"], r["s_id"], r["relation"]) for r in
                 spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                              "find_relation", _cfg()).take_all())
    assert got == exp


def test_broadcast_empty_s(ray_session):
    tp = table_layer("points", 100, seed=37, bounds=BOUNDS)
    empty = table_layer("polygons", 0, seed=38, bounds=BOUNDS)
    out = spatial_join_broadcast(rd.from_arrow(tp), rd.from_arrow(empty),
                                 "intersects", _cfg(), concurrency=1)
    assert out.count() == 0


def test_broadcast_partitioning_invariance(ray_session):
    """Same pair set regardless of R's block layout (exactly-once is
    structural — each R row visits exactly one task)."""
    tp = table_layer("points", 800, seed=39, bounds=BOUNDS)
    ts = table_layer("polygons", 45, seed=40, bounds=BOUNDS,
                     min_edge=3.0, max_edge=12.0, min_v=4, max_v=10)
    one = _pairs(spatial_join_broadcast(
        rd.from_arrow(tp), rd.from_arrow(ts), "covered_by", _cfg(),
        concurrency=1))
    many = _pairs(spatial_join_broadcast(
        rd.from_arrow(tp).repartition(16), rd.from_arrow(ts).repartition(7),
        "covered_by", _cfg(), concurrency=2))
    assert one == many and len(one) > 0


@pytest.mark.parametrize("predicate", ["intersects", "covered_by",
                                       "find_relation"])
def test_broadcast_april_parity(ray_session, predicate):
    """APRIL intermediate filter ON the broadcast path (r5): must change
    nothing vs filter-off broadcast AND vs the filter-on shuffle path —
    the same three-way stage-equivalence rule the shuffle path holds."""
    tr = table_layer("polygons", 200, seed=71, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    ts = table_layer("polygons", 55, seed=72, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    r, s = rd.from_arrow(tr), rd.from_arrow(ts)
    cfg_on = EngineConfig(dataspace=BOUNDS, ppd=8,
                          intermediate_filter=True)

    def rows(ds):
        if predicate == "find_relation":
            return sorted((x["r_id"], x["s_id"], x["relation"])
                          for x in ds.take_all())
        return _pairs(ds)

    got = rows(spatial_join_broadcast(r, s, predicate, cfg_on,
                                      concurrency=2))
    assert got == rows(spatial_join_broadcast(r, s, predicate, _cfg(),
                                              concurrency=2))
    assert got == rows(spatial_join(r, s, predicate, cfg_on))
    assert len(got) > 0


def test_broadcast_april_reuses_persisted(ray_session, tmp_path):
    """Pre-rasterized inputs (persist_april roundtrip) skip regeneration
    on BOTH sides of the broadcast path and still match filter-off."""
    from hecatoncheir_ray.april import load_april, persist_april
    tr = table_layer("polygons", 120, seed=73, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    ts = table_layer("polygons", 40, seed=74, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    cfg_on = EngineConfig(dataspace=BOUNDS, ppd=8,
                          intermediate_filter=True)
    pr, ps = str(tmp_path / "r_april"), str(tmp_path / "s_april")
    persist_april(rd.from_arrow(tr), pr, BOUNDS, cfg_on.april_n)
    persist_april(rd.from_arrow(ts), ps, BOUNDS, cfg_on.april_n)
    got = _pairs(spatial_join_broadcast(load_april(pr), load_april(ps),
                                        "intersects", cfg_on,
                                        concurrency=2))
    exp = _pairs(spatial_join_broadcast(rd.from_arrow(tr),
                                        rd.from_arrow(ts),
                                        "intersects", _cfg(),
                                        concurrency=2))
    assert got == exp and len(got) > 0


def test_auto_path_selection_parity(ray_session):
    """spatial_join_auto picks broadcast for small S and shuffle for
    large S — identical pair sets on BOTH sides of the switch point
    (the threshold is forced tiny so one layer sits on each side)."""
    from hecatoncheir_ray import spatial_join_auto

    tp = table_layer("points", 400, seed=61, bounds=BOUNDS)
    ts = table_layer("polygons", 50, seed=62, bounds=BOUNDS,
                     min_edge=3.0, max_edge=12.0, min_v=4, max_v=10)
    r, s = rd.from_arrow(tp), rd.from_arrow(ts)
    exp = _pairs(spatial_join(r, s, "intersects", _cfg()))

    # S (50 rows) <= threshold -> broadcast path
    assert _pairs(spatial_join_auto(r, s, "intersects", _cfg(),
                                    broadcast_max_rows=64,
                                    concurrency=2)) == exp
    # S > threshold -> grid-shuffle path
    assert _pairs(spatial_join_auto(r, s, "intersects", _cfg(),
                                    broadcast_max_rows=8)) == exp
    # explicit overrides still honored
    assert _pairs(spatial_join_auto(r, s, "intersects", _cfg(),
                                    broadcast=True,
                                    concurrency=2)) == exp
    assert _pairs(spatial_join_auto(r, s, "intersects", _cfg(),
                                    broadcast=False)) == exp
    assert len(exp) > 0
