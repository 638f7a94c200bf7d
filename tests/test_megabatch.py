"""Containment-family mega-batch (refine_mask / classify_relations):
parity with the per-pair DE-9IM evaluator, and the per-pair fallback
counters stay at ZERO on realistic (non-touching) layers.

No Ray needed — the kernels are pure numpy over the geo tuple.
"""

import numpy as np
import pyarrow as pa
import pytest

from hecatoncheir_ray.geometry import eval_predicate, find_relation
from hecatoncheir_ray.geometry.predicates import relate_mbrs
from hecatoncheir_ray.sources.synth import table_layer
from hecatoncheir_ray.stages import sweep
from hecatoncheir_ray.stages.assign import geoms_from_table

BOUNDS = (0.0, 0.0, 100.0, 50.0)
PREDS = ["inside", "covered_by", "contains", "covers", "equal", "meet"]


def _sq(x0, y0, x1, y1):
    return np.array([x0, y0, x1, y0, x1, y1, x0, y1], dtype=np.float64)


def _table(geoms):
    """geoms: list of (gtype, coords) -> geometry pa.Table."""
    from hecatoncheir_ray.geometry.core import mbr_of
    flat, offs = [], [0]
    gts, mb = [], []
    for gt, c in geoms:
        flat.append(np.asarray(c, dtype=np.float64))
        offs.append(offs[-1] + len(c))
        gts.append(gt)
        mb.append(mbr_of(gt, np.asarray(c, dtype=np.float64)))
    mb = np.array(mb)
    coords = pa.ListArray.from_arrays(
        pa.array(np.array(offs, dtype=np.int32)),
        pa.array(np.concatenate(flat), type=pa.float64()))
    return pa.table({
        "id": pa.array(np.arange(len(geoms), dtype=np.int64)),
        "gtype": pa.array(np.array(gts, dtype=np.int8)),
        "coords": coords,
        "minx": pa.array(mb[:, 0]), "miny": pa.array(mb[:, 1]),
        "maxx": pa.array(mb[:, 2]), "maxy": pa.array(mb[:, 3])})


def _mbr_pairs(geo):
    """All MBR-overlapping (i, j) index pairs, i from the first half."""
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    n = len(ids) // 2
    gri, gsi = [], []
    for i in range(n):
        for j in range(n, len(ids)):
            if not (minx[i] > maxx[j] or minx[j] > maxx[i]
                    or miny[i] > maxy[j] or miny[j] > maxy[i]):
                gri.append(i)
                gsi.append(j)
    return np.array(gri, dtype=np.int64), np.array(gsi, dtype=np.int64)


GT_POLY = 3


@pytest.fixture
def handmade_geo():
    """One reference square against every containment archetype: nested,
    touching-inside, equal, edge-meet, corner-meet, overlap, disjoint."""
    from hecatoncheir_ray.geometry.core import GT_POLYGON
    A = [(GT_POLYGON, _sq(0, 0, 10, 10))] * 7
    B = [(GT_POLYGON, _sq(2, 2, 8, 8)),       # strictly inside
         (GT_POLYGON, _sq(0, 2, 8, 8)),       # covered_by, shares an edge
         (GT_POLYGON, _sq(0, 0, 10, 10)),     # equal
         (GT_POLYGON, _sq(10, 0, 20, 10)),    # meet along an edge
         (GT_POLYGON, _sq(10, 10, 20, 20)),   # meet at a corner
         (GT_POLYGON, _sq(5, 5, 15, 15)),     # proper overlap
         (GT_POLYGON, _sq(20, 20, 30, 30))]   # disjoint
    return geoms_from_table(_table(A + B))


@pytest.mark.parametrize("predicate", PREDS)
def test_handmade_archetypes_vs_per_pair(handmade_geo, predicate):
    geo = handmade_geo
    ids, gtypes, offs, vals, *_ = geo
    gri, gsi = _mbr_pairs(geo)
    keep = sweep.refine_mask(None, geo, gri, gsi, predicate)
    want = np.array([
        eval_predicate(predicate, int(gtypes[i]),
                       vals[offs[i]:offs[i + 1]],
                       int(gtypes[j]), vals[offs[j]:offs[j + 1]])
        for i, j in zip(gri, gsi)])
    assert (keep == want).all(), predicate


@pytest.mark.parametrize("predicate", PREDS)
def test_random_layers_vs_per_pair_zero_fallback(predicate):
    """Random synth layers: bit-identical to the per-pair evaluator AND the
    per-pair fallback never fires (VERDICT r2 item 4 'done' criterion)."""
    kw = dict(bounds=BOUNDS, min_edge=2.0, max_edge=12.0, min_v=4, max_v=12)
    tr = table_layer("polygons", 150, seed=11, **kw)
    ts = table_layer("polygons", 150, seed=12, **kw)
    geo = geoms_from_table(pa.concat_tables([tr, ts]))
    ids, gtypes, offs, vals, *_ = geo
    gri, gsi = _mbr_pairs(geo)
    assert len(gri) > 50
    sweep.reset_pair_fallbacks()
    keep = sweep.refine_mask(None, geo, gri, gsi, predicate)
    assert sweep.PAIR_FALLBACKS["refine_undecided"] == 0
    assert sweep.PAIR_FALLBACKS["refine_rest"] == 0
    want = np.array([
        eval_predicate(predicate, int(gtypes[i]),
                       vals[offs[i]:offs[i + 1]],
                       int(gtypes[j]), vals[offs[j]:offs[j + 1]])
        for i, j in zip(gri, gsi)])
    assert (keep == want).all()


def test_random_layers_nested_containment():
    """Force true containment pairs (small polys nested in big ones) and
    check the decided-vectorized path gets them right with zero fallback."""
    big = table_layer("polygons", 120, seed=3, bounds=BOUNDS,
                      min_edge=10.0, max_edge=20.0, min_v=6, max_v=12)
    small = table_layer("polygons", 120, seed=4, bounds=BOUNDS,
                        min_edge=0.5, max_edge=1.5, min_v=4, max_v=8)
    geo = geoms_from_table(pa.concat_tables([small, big]))
    ids, gtypes, offs, vals, *_ = geo
    gri, gsi = _mbr_pairs(geo)
    sweep.reset_pair_fallbacks()
    for predicate in ("inside", "covered_by"):
        keep = sweep.refine_mask(None, geo, gri, gsi, predicate)
        want = np.array([
            eval_predicate(predicate, int(gtypes[i]),
                           vals[offs[i]:offs[i + 1]],
                           int(gtypes[j]), vals[offs[j]:offs[j + 1]])
            for i, j in zip(gri, gsi)])
        assert (keep == want).all()
        assert keep.sum() > 0          # the fixture really has containments
    assert sweep.PAIR_FALLBACKS["refine_undecided"] == 0


def test_find_relation_containment_mbrs_zero_fallback():
    """classify_relations: nested layers exercise the MBR containment
    branches; result matches per-pair find_relation with zero per-pair
    calls (VERDICT r2 item 5 'done' criterion)."""
    big = table_layer("polygons", 100, seed=5, bounds=BOUNDS,
                      min_edge=10.0, max_edge=20.0, min_v=6, max_v=12)
    small = table_layer("polygons", 100, seed=6, bounds=BOUNDS,
                        min_edge=0.5, max_edge=1.5, min_v=4, max_v=8)
    geo = geoms_from_table(pa.concat_tables([small, big]))
    ids, gtypes, offs, vals, minx, miny, maxx, maxy = geo
    gri, gsi = _mbr_pairs(geo)
    from hecatoncheir_ray.config import EngineConfig
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8)
    sweep.reset_pair_fallbacks()
    rel = sweep.classify_relations(cfg, geo, gri, gsi)
    assert sweep.PAIR_FALLBACKS["relation_rest"] == 0
    assert sweep.PAIR_FALLBACKS["relation_touch"] == 0
    want = np.array([
        find_relation(int(gtypes[i]), vals[offs[i]:offs[i + 1]],
                      int(gtypes[j]), vals[offs[j]:offs[j + 1]],
                      relate_mbrs(minx[i], miny[i], maxx[i], maxy[i],
                                  minx[j], miny[j], maxx[j], maxy[j]))
        for i, j in zip(gri, gsi)], dtype=np.int8)
    assert (rel == want).all()
    from hecatoncheir_ray.geometry.predicates import TR_INSIDE
    assert (rel == TR_INSIDE).sum() > 0


def test_polygon_window_range_vectorized():
    """Non-point range windows ride the mega-batched refine_mask: parity
    with the per-candidate evaluator (VERDICT r2 item 6)."""
    from hecatoncheir_ray.geometry.core import GT_BOX, GT_POLYGON
    from hecatoncheir_ray.pipelines.range_query import make_range_fn
    t = table_layer("polygons", 300, seed=21, bounds=BOUNDS,
                    min_edge=2.0, max_edge=8.0, min_v=4, max_v=10)
    win_poly = np.array([20, 10, 60, 12, 65, 40, 25, 35], dtype=np.float64)
    win_box = np.array([10, 10, 45, 30], dtype=np.float64)
    wins = [(0, GT_POLYGON, win_poly), (1, GT_BOX, win_box)]
    hits = make_range_fn(wins)(t)
    got = sorted(zip(hits["query_id"].to_pylist(), hits["id"].to_pylist()))
    want = []
    geo = geoms_from_table(t)
    ids, gtypes, offs, vals, *_ = geo
    for qid, wgt, wc in wins:
        for i in range(len(ids)):
            if eval_predicate("intersects", wgt, wc, int(gtypes[i]),
                              vals[offs[i]:offs[i + 1]]):
                want.append((qid, int(ids[i])))
    assert got == sorted(want)
    assert len(got) > 10
