"""Spatial semi / anti join: the existential form of the pair joins.

Ground truth per test is the pair join itself (already verified against
brute force / DuckDB everywhere): semi ids == unique r_id of the pair
set, anti ids == R's complement, semi and anti partition R exactly, and
R's payload columns come back untouched (the id filter ships whole rows;
match multiplicity never duplicates them).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig, spatial_join, spatial_join_semi
from hecatoncheir_ray.sources.synth import table_layer

BOUNDS = (0.0, 0.0, 100.0, 50.0)


def _cfg(**kw):
    return EngineConfig(dataspace=BOUNDS, ppd=8,
                        intermediate_filter=False, **kw)


def _layers(seed_r, seed_s, nr=250, ns=60):
    tr = table_layer("polygons", nr, seed=seed_r, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    ts = table_layer("polygons", ns, seed=seed_s, bounds=BOUNDS,
                     min_edge=2.0, max_edge=9.0, min_v=4, max_v=10)
    return tr, ts


@pytest.mark.parametrize("predicate", ["intersects", "covered_by"])
def test_semi_anti_partition_r(ray_session, predicate):
    tr, ts = _layers(41, 42)
    r, s = rd.from_arrow(tr), rd.from_arrow(ts)
    matched = {p["r_id"] for p in
               spatial_join(r, s, predicate, _cfg()).take_all()}
    all_ids = set(tr["id"].to_pylist())
    semi = {row["id"] for row in
            spatial_join_semi(r, s, predicate, _cfg(),
                              broadcast=False).take_all()}
    anti = {row["id"] for row in
            spatial_join_semi(r, s, predicate, _cfg(), anti=True,
                              broadcast=False).take_all()}
    assert semi == matched
    assert anti == all_ids - matched
    assert semi | anti == all_ids and not (semi & anti)
    assert 0 < len(semi) < len(all_ids)  # both sides non-trivial


def test_semi_no_duplicate_rows(ray_session):
    # many S matches per R row must still yield ONE output row per R row
    tp = table_layer("points", 400, seed=43, bounds=BOUNDS)
    ts = table_layer("boxes", 80, seed=44, bounds=BOUNDS,
                     min_edge=10.0, max_edge=30.0)  # heavy overlap
    out = spatial_join_semi(rd.from_arrow(tp), rd.from_arrow(ts),
                            "covered_by", _cfg(),
                            broadcast=False).take_all()
    ids = [row["id"] for row in out]
    assert len(ids) == len(set(ids))
    pair_r = {p["r_id"] for p in
              spatial_join(rd.from_arrow(tp), rd.from_arrow(ts),
                           "covered_by", _cfg()).take_all()}
    assert set(ids) == pair_r


def test_semi_preserves_payload_schema(ray_session):
    tp = table_layer("points", 200, seed=45, bounds=BOUNDS)
    cap = pa.array([f"cap-{i}" for i in tp["id"].to_pylist()])
    tp2 = tp.append_column("caption", cap)
    ts = table_layer("boxes", 30, seed=46, bounds=BOUNDS,
                     min_edge=5.0, max_edge=20.0)
    out = spatial_join_semi(rd.from_arrow(tp2), rd.from_arrow(ts),
                            "covered_by", _cfg(), broadcast=False)
    rows = out.take_all()
    assert set(out.schema().names) == set(tp2.schema.names)
    for row in rows:
        assert row["caption"] == f"cap-{row['id']}"


def test_semi_broadcast_plan_parity(ray_session):
    tr, ts = _layers(47, 48, nr=180, ns=40)
    r, s = rd.from_arrow(tr), rd.from_arrow(ts)
    shuffle = sorted(row["id"] for row in
                     spatial_join_semi(r, s, "intersects", _cfg(),
                                       broadcast=False).take_all())
    bcast = sorted(row["id"] for row in
                   spatial_join_semi(r, s, "intersects", _cfg(),
                                     broadcast=True).take_all())
    auto = sorted(row["id"] for row in
                  spatial_join_semi(r, s, "intersects",
                                    _cfg()).take_all())
    assert shuffle == bcast == auto


def test_anti_empty_s_keeps_all(ray_session):
    tp = table_layer("points", 120, seed=49, bounds=BOUNDS)
    empty = table_layer("polygons", 0, seed=50, bounds=BOUNDS)
    out = spatial_join_semi(rd.from_arrow(tp), rd.from_arrow(empty),
                            "intersects", _cfg(), anti=True,
                            broadcast=True)
    assert sorted(row["id"] for row in out.take_all()) \
        == sorted(tp["id"].to_pylist())


def test_semi_rejects_find_relation(ray_session):
    tp = table_layer("points", 10, seed=51, bounds=BOUNDS)
    ts = table_layer("boxes", 5, seed=52, bounds=BOUNDS,
                     min_edge=2.0, max_edge=8.0)
    with pytest.raises(ValueError, match="find_relation"):
        spatial_join_semi(rd.from_arrow(tp), rd.from_arrow(ts),
                          "find_relation", _cfg())
