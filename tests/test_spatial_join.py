"""End-to-end spatial join vs a brute-force O(n^2) oracle (FIXTURES.md §4).

The oracle evaluates every (r,s) pair with the per-pair predicate evaluator
(unit-tested independently in test_geometry.py); the pipeline must produce
the identical sorted pair set for every predicate and type pairing, with the
intermediate stages toggled on and off.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig, spatial_join
from hecatoncheir_ray.geometry import TR_NAMES, eval_predicate, find_relation
from hecatoncheir_ray.geometry.predicates import relate_mbrs
from hecatoncheir_ray.sources.synth import table_layer

BOUNDS = (0.0, 0.0, 100.0, 50.0)


def _oracle_pairs(tr: pa.Table, ts: pa.Table, predicate: str):
    """Brute force: all pairs with overlapping MBRs -> refined set."""
    out = []
    r = tr.to_pylist()
    s = ts.to_pylist()
    for a in r:
        for b in s:
            if (a["minx"] > b["maxx"] or b["minx"] > a["maxx"]
                    or a["miny"] > b["maxy"] or b["miny"] > a["maxy"]):
                continue
            ca = np.asarray(a["coords"])
            cb = np.asarray(b["coords"])
            if predicate == "find_relation":
                mc = relate_mbrs(a["minx"], a["miny"], a["maxx"], a["maxy"],
                                 b["minx"], b["miny"], b["maxx"], b["maxy"])
                rel = find_relation(a["gtype"], ca, b["gtype"], cb, mc)
                out.append((a["id"], b["id"], rel))
            elif eval_predicate(predicate, a["gtype"], ca, b["gtype"], cb):
                out.append((a["id"], b["id"]))
    return sorted(out)


def _run_join(tr, ts, predicate, **cfg_kw):
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, **cfg_kw)
    pairs = spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                         predicate, cfg)
    rows = pairs.take_all()
    if predicate == "find_relation":
        return sorted((r["r_id"], r["s_id"], r["relation"]) for r in rows)
    return sorted((r["r_id"], r["s_id"]) for r in rows)


POLY_KW = dict(bounds=BOUNDS, min_edge=2.0, max_edge=12.0, min_v=4, max_v=12)


@pytest.mark.parametrize("predicate", ["intersects", "inside", "contains",
                                       "covered_by", "covers", "disjoint",
                                       "meet", "equal", "find_relation"])
def test_poly_poly_join_vs_oracle(ray_session, predicate):
    tr = table_layer("polygons", 120, seed=7, **POLY_KW)
    ts = table_layer("polygons", 120, seed=8, **POLY_KW)
    assert _run_join(tr, ts, predicate) == _oracle_pairs(tr, ts, predicate)


def test_point_poly_join_vs_oracle(ray_session):
    tp = table_layer("points", 400, seed=9, bounds=BOUNDS)
    ts = table_layer("polygons", 80, seed=10, **POLY_KW)
    for predicate in ["intersects", "inside", "covered_by"]:
        assert _run_join(tp, ts, predicate) == _oracle_pairs(tp, ts, predicate)
    # reversed: polygon contains point
    for predicate in ["contains", "covers", "intersects"]:
        assert _run_join(ts, tp, predicate) == _oracle_pairs(ts, tp, predicate)


def test_poly_line_join_vs_oracle(ray_session):
    tl = table_layer("linestrings", 100, seed=11, bounds=BOUNDS,
                     min_v=2, max_v=8, step=2.0)
    ts = table_layer("polygons", 80, seed=12, **POLY_KW)
    for predicate in ["intersects", "contains", "find_relation"]:
        assert _run_join(ts, tl, predicate) == _oracle_pairs(ts, tl, predicate)


def test_mbr_only_superset(ray_session):
    """Stage-equivalence (SURVEY §5): MBR-only output ⊇ refined output."""
    tr = table_layer("polygons", 100, seed=13, **POLY_KW)
    ts = table_layer("polygons", 100, seed=14, **POLY_KW)
    full = set(_run_join(tr, ts, "intersects"))
    mbr_only = set(_run_join(tr, ts, "intersects", refinement=False))
    assert full <= mbr_only


def test_salting_identical_results(ray_session):
    """Hot-cell salting must not change the result set."""
    import ray.data as rd2
    from hecatoncheir_ray import detect_hot_cells
    tr = table_layer("polygons", 150, seed=15, **POLY_KW)
    ts = table_layer("polygons", 150, seed=16, **POLY_KW)
    base = _run_join(tr, ts, "intersects")
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, hot_cell_rows=10)
    grid = cfg.make_grid()
    hot = detect_hot_cells(rd2.from_arrow(tr), rd2.from_arrow(ts), cfg, grid)
    assert len(hot) > 0
    pairs = spatial_join(rd2.from_arrow(tr), rd2.from_arrow(ts),
                         "intersects", cfg, hot_cells=hot)
    salted = sorted((r["r_id"], r["s_id"]) for r in pairs.take_all())
    assert salted == base


def test_auto_dataspace(ray_session):
    tr = table_layer("polygons", 60, seed=17, **POLY_KW)
    ts = table_layer("polygons", 60, seed=18, **POLY_KW)
    cfg = EngineConfig(ppd=8)  # no dataspace -> computed
    pairs = spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                         "intersects", cfg)
    got = sorted((r["r_id"], r["s_id"]) for r in pairs.take_all())
    assert got == _oracle_pairs(tr, ts, "intersects")


def test_line_line_join_vs_oracle(ray_session):
    """T8NA-style linestring x linestring via the mega-batched edge-cross
    path (open-path edges; VERDICT r1 item 8)."""
    ta = table_layer("linestrings", 120, seed=21, bounds=BOUNDS,
                     min_v=2, max_v=8, step=2.0)
    tb = table_layer("linestrings", 120, seed=22, bounds=BOUNDS,
                     min_v=2, max_v=8, step=2.0)
    for predicate in ["intersects", "disjoint"]:
        assert _run_join(ta, tb, predicate) == _oracle_pairs(ta, tb,
                                                             predicate)


def test_line_poly_reversed_vs_oracle(ray_session):
    """Line on the R side, polygon on S (the mixed branch's other arm)."""
    tl = table_layer("linestrings", 100, seed=23, bounds=BOUNDS,
                     min_v=2, max_v=8, step=2.0)
    ts = table_layer("polygons", 80, seed=24, **POLY_KW)
    for predicate in ["intersects", "disjoint"]:
        assert _run_join(tl, ts, predicate) == _oracle_pairs(tl, ts,
                                                             predicate)


def test_auto_salt_skewed_layer(ray_session):
    """Default-on skew safety (VERDICT r1 item 9): a layer with most rows
    piled into one cell is detected and salted automatically, results
    identical to the unsalted join."""
    import pyarrow as pa
    import ray.data as rd2
    from hecatoncheir_ray import detect_hot_cells
    from hecatoncheir_ray.sources.synth import synth_points

    ids = np.arange(3000, dtype=np.int64)
    # 90% of points crammed into a single cell of an 8x8 grid over BOUNDS
    hot_box = (BOUNDS[0] + 0.1, BOUNDS[1] + 0.1,
               BOUNDS[0] + 0.2, BOUNDS[1] + 0.2)
    t_hot = synth_points(ids[:2700], seed=41, bounds=hot_box)
    t_cold = synth_points(ids[2700:], seed=42, bounds=BOUNDS)
    pts = pa.concat_tables([t_hot, t_cold])
    polys = table_layer("polygons", 60, seed=43, **POLY_KW)

    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, hot_cell_rows=500,
                       auto_salt=True)
    grid = cfg.make_grid()
    hot = detect_hot_cells(rd2.from_arrow(pts), rd2.from_arrow(polys),
                           cfg, grid)
    assert len(hot) >= 1                     # the crammed cell is caught

    auto = spatial_join(rd2.from_arrow(pts), rd2.from_arrow(polys),
                        "intersects", cfg)
    base_cfg = EngineConfig(dataspace=BOUNDS, ppd=8, auto_salt=False)
    base = spatial_join(rd2.from_arrow(pts), rd2.from_arrow(polys),
                        "intersects", base_cfg)
    assert sorted((r["r_id"], r["s_id"]) for r in auto.take_all()) \
        == sorted((r["r_id"], r["s_id"]) for r in base.take_all())


def test_hot_cell_detection_sampled_default(ray_session):
    """At the DEFAULT threshold (hot_cell_rows=4096, sample fraction
    1/64) detection runs the sampled branch: a 10k-row stacked cell is
    flagged, a uniform layer flags nothing, and the flag set is stable
    across resharding (coordinate-hash sampling, not block-positional)."""
    import pyarrow as pa
    import ray.data as rd2
    from hecatoncheir_ray import detect_hot_cells
    from hecatoncheir_ray.sources.synth import synth_points

    ids = np.arange(12000, dtype=np.int64)
    hot_box = (BOUNDS[0] + 0.1, BOUNDS[1] + 0.1,
               BOUNDS[0] + 0.2, BOUNDS[1] + 0.2)
    t_hot = synth_points(ids[:10000], seed=51, bounds=hot_box)
    t_cold = synth_points(ids[10000:], seed=52, bounds=BOUNDS)
    pts = pa.concat_tables([t_hot, t_cold])
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8)       # defaults: 4096, 1/64
    grid = cfg.make_grid()
    empty = rd2.from_arrow(pts.slice(0, 0))

    hot = detect_hot_cells(rd2.from_arrow(pts), empty, cfg, grid)
    # the crammed cell is cell (0,0)'s neighborhood: expect exactly it
    assert len(hot) == 1
    # resharding must not change the sampled decision
    hot2 = detect_hot_cells(
        rd2.from_arrow(pts).repartition(7), empty, cfg, grid)
    assert list(hot) == list(hot2)
    # a uniform 12k layer has no cell near 4096 replicas: nothing flagged
    t_uni = synth_points(ids, seed=53, bounds=BOUNDS)
    assert len(detect_hot_cells(rd2.from_arrow(t_uni), empty,
                                cfg, grid)) == 0


def _brute_dist_leq(ta, tb, d):
    """Driver-side oracle: dist(A,B) <= d via intersects OR min
    vertex-to-segment distance, computed per pair with plain numpy."""
    from hecatoncheir_ray.geometry.core import (GT_LINESTRING, GT_POINT,
                                                GT_POLYGON)
    from hecatoncheir_ray.geometry.fast import eval_predicate
    from hecatoncheir_ray.stages.assign import geoms_from_table

    def segs(gt, c):
        p = c.reshape(-1, 2)
        if gt == GT_POINT or len(p) == 1:
            return np.stack([p, p], axis=1)
        if gt == GT_POLYGON:
            return np.stack([p, np.roll(p, -1, axis=0)], axis=1)
        return np.stack([p[:-1], p[1:]], axis=1)

    def vseg(pts, sg):
        a = sg[:, 0][None, :, :]
        e = (sg[:, 1] - sg[:, 0])[None, :, :]
        w = pts[:, None, :] - a
        len2 = (e * e).sum(-1)
        t = np.clip((w * e).sum(-1) / np.where(len2 > 0, len2, 1.0), 0, 1)
        dd = w - t[:, :, None] * e
        return np.sqrt((dd * dd).sum(-1).min())

    ga = geoms_from_table(ta)
    gb = geoms_from_table(tb)
    out = []
    for i in range(len(ga[0])):
        ca = ga[3][ga[2][i]:ga[2][i + 1]]
        for j in range(len(gb[0])):
            cb = gb[3][gb[2][j]:gb[2][j + 1]]
            gta, gtb = int(ga[1][i]), int(gb[1][j])
            if eval_predicate("intersects", gta, ca, gtb, cb):
                out.append((int(ga[0][i]), int(gb[0][j])))
                continue
            pa_ = ca.reshape(-1, 2)
            pb_ = cb.reshape(-1, 2)
            md = min(vseg(pa_, segs(gtb, cb)), vseg(pb_, segs(gta, ca)))
            if md <= d:
                out.append((int(ga[0][i]), int(gb[0][j])))
    return sorted(out)


def test_distance_join_poly_poly(ray_session):
    from hecatoncheir_ray.pipelines.distance_join import distance_join
    ta = table_layer("polygons", 60, seed=51, **POLY_KW)
    tb = table_layer("polygons", 60, seed=52, **POLY_KW)
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, auto_salt=False)
    got = distance_join(rd.from_arrow(ta), rd.from_arrow(tb), 1.5, cfg)
    pairs = sorted((r["r_id"], r["s_id"]) for r in got.take_all())
    assert pairs == _brute_dist_leq(ta, tb, 1.5)
    assert len(pairs) > 0


def test_distance_join_mixed_line_point(ray_session):
    from hecatoncheir_ray.pipelines.distance_join import distance_join
    tl = table_layer("linestrings", 80, seed=53, bounds=BOUNDS,
                     min_v=2, max_v=6, step=2.0)
    tp = table_layer("points", 150, seed=54, bounds=BOUNDS)
    cfg = EngineConfig(dataspace=BOUNDS, ppd=8, auto_salt=False)
    got = distance_join(rd.from_arrow(tl), rd.from_arrow(tp), 2.0, cfg)
    pairs = sorted((r["r_id"], r["s_id"]) for r in got.take_all())
    assert pairs == _brute_dist_leq(tl, tp, 2.0)
    assert len(pairs) > 0
