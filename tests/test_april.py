"""APRIL rasterizer + interval filter tests.

Soundness properties (what the filter relies on):
* every point of the geometry lies in a cell covered by the A-list;
* every F-list cell is entirely inside the polygon;
* filter decisions agree with exact predicates (stage equivalence:
  intermediate filter on == off == brute-force oracle, SURVEY.md §5).
"""

import numpy as np
import pytest

from hecatoncheir_ray.april import (INCONCLUSIVE, TRUE_HIT, TRUE_NEGATIVE,
                                    april_filter_predicate, intervals_contained,
                                    intervals_intersect, intervals_match,
                                    rasterize_geometry)
from hecatoncheir_ray.geometry import GT_LINESTRING, GT_POINT, GT_POLYGON
from hecatoncheir_ray.geometry.hilbert import xy2d
from hecatoncheir_ray.geometry.predicates import points_in_ring
from hecatoncheir_ray.sources.synth import table_layer

BOUNDS = (0.0, 0.0, 64.0, 64.0)
ORDER = 6   # 64x64 raster; scale = (64-1)/64


def _covered(iv, ids):
    """bool per id: inside some [s,e) interval."""
    if len(iv) == 0:
        return np.zeros(len(ids), dtype=bool)
    s, e = iv[0::2], iv[1::2]
    idx = np.searchsorted(s, ids, side="right") - 1
    ok = (idx >= 0) & (ids < e[np.clip(idx, 0, len(e) - 1)])
    return ok


def _cell_of(pts):
    cpd = 1 << ORDER
    sc = (cpd - 1) / 64.0
    cx = np.clip((pts[:, 0] * sc).astype(np.int64), 0, cpd - 1)
    cy = np.clip((pts[:, 1] * sc).astype(np.int64), 0, cpd - 1)
    return xy2d(ORDER, cx, cy)


@pytest.mark.parametrize("seed", range(5))
def test_rasterize_polygon_soundness(seed):
    rng = np.random.default_rng(seed)
    t = table_layer("polygons", 1, seed=seed, bounds=(16, 16, 48, 48),
                    min_edge=6.0, max_edge=14.0, min_v=5, max_v=12)
    coords = np.asarray(t["coords"][0].as_py())
    ring = coords.reshape(-1, 2)
    a, f = rasterize_geometry(GT_POLYGON, coords, BOUNDS, ORDER)
    assert len(a) >= 2 and len(a) % 2 == 0 and len(f) % 2 == 0
    # interior sample points -> cells covered by ALL
    lo, hi = ring.min(0), ring.max(0)
    pts = rng.uniform(lo, hi, size=(3000, 2))
    inside = points_in_ring(pts, ring) == 1
    ids = _cell_of(pts[inside])
    assert _covered(a, ids).all()
    # boundary points (edge midpoints) covered by ALL
    mids = (ring + np.roll(ring, -1, axis=0)) / 2
    assert _covered(a, _cell_of(mids)).all()
    # FULL cells entirely inside: sample corners+center of each full cell
    if len(f):
        cpd = 1 << ORDER
        sc = 64.0 / (cpd - 1)
        from hecatoncheir_ray.geometry.hilbert import d2xy
        full_ids = np.concatenate([np.arange(f[i], f[i + 1])
                                   for i in range(0, len(f), 2)])
        cx, cy = d2xy(ORDER, full_ids)
        for ox, oy in [(0.01, 0.01), (0.99, 0.01), (0.5, 0.5),
                       (0.01, 0.99), (0.99, 0.99)]:
            p = np.stack([(cx + ox) * sc, (cy + oy) * sc], axis=1)
            assert (points_in_ring(p, ring) == 1).all()
        # FULL disjoint from... FULL ⊆ ALL by construction
        assert intervals_contained(f, a)


def test_rasterize_point_and_line():
    a, f = rasterize_geometry(GT_POINT, np.array([10.0, 20.0]),
                              BOUNDS, ORDER)
    assert len(a) == 2 and len(f) == 0
    ids = _cell_of(np.array([[10.0, 20.0]]))
    assert _covered(a, ids).all()
    line = np.array([5.0, 5.0, 40.0, 30.0, 10.0, 50.0])
    a, f = rasterize_geometry(GT_LINESTRING, line, BOUNDS, ORDER)
    assert len(f) == 0
    pts = line.reshape(-1, 2)
    for t in np.linspace(0, 1, 50):
        for i in range(len(pts) - 1):
            p = pts[i] + t * (pts[i + 1] - pts[i])
            assert _covered(a, _cell_of(p[None, :])).all()


def test_interval_ops():
    a = np.array([2, 5, 9, 12], dtype=np.uint32)
    b = np.array([5, 9], dtype=np.uint32)
    c = np.array([0, 20], dtype=np.uint32)
    assert not intervals_intersect(a, b)        # [s,e) touching != overlap
    assert intervals_intersect(a, c)
    assert intervals_contained(a, c)
    assert not intervals_contained(c, a)
    assert intervals_match(a, a.copy())
    assert not intervals_match(a, b)


def test_filter_decisions_vs_exact():
    """Filter never contradicts the exact predicate on random polygon pairs."""
    from hecatoncheir_ray.geometry import eval_predicate
    t1 = table_layer("polygons", 30, seed=3, bounds=(8, 8, 56, 56),
                     min_edge=6.0, max_edge=12.0, min_v=4, max_v=10)
    rows = t1.to_pylist()
    aprils = [rasterize_geometry(GT_POLYGON, np.asarray(r["coords"]),
                                 BOUNDS, ORDER) for r in rows]
    checked = {TRUE_HIT: 0, TRUE_NEGATIVE: 0, INCONCLUSIVE: 0}
    for i, a in enumerate(rows):
        for j, b in enumerate(rows):
            for pred in ["intersects", "disjoint", "covered_by", "covers",
                         "inside", "contains", "equal", "meet"]:
                dec = april_filter_predicate(pred, *aprils[i], *aprils[j])
                checked[dec] = checked.get(dec, 0) + 1
                if dec != INCONCLUSIVE:
                    exact = eval_predicate(pred, GT_POLYGON,
                                           np.asarray(a["coords"]),
                                           GT_POLYGON,
                                           np.asarray(b["coords"]))
                    assert exact == (dec == TRUE_HIT), \
                        (pred, i, j, dec, exact)
    # the filter must actually decide a meaningful share
    assert checked[TRUE_HIT] > 0 and checked[TRUE_NEGATIVE] > 0


def test_join_stage_equivalence(ray_session):
    """intermediate filter on == off for every predicate (SURVEY §5)."""
    import ray.data as rd
    from hecatoncheir_ray import EngineConfig, spatial_join
    KW = dict(bounds=(0.0, 0.0, 100.0, 50.0), min_edge=2.0, max_edge=12.0,
              min_v=4, max_v=12)
    tr = table_layer("polygons", 100, seed=7, **KW)
    ts = table_layer("polygons", 100, seed=8, **KW)
    for pred in ["intersects", "covered_by", "equal", "meet",
                 "find_relation"]:
        outs = []
        for flt in (False, True):
            cfg = EngineConfig(dataspace=(0, 0, 100, 50), ppd=8,
                               intermediate_filter=flt, april_n=8)
            ds = spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                              pred, cfg)
            rows = ds.take_all()
            if pred == "find_relation":
                outs.append(sorted((r["r_id"], r["s_id"], r["relation"])
                                   for r in rows))
            else:
                outs.append(sorted((r["r_id"], r["s_id"]) for r in rows))
        assert outs[0] == outs[1], pred


def test_april_persist_roundtrip(ray_session, tmp_path):
    """S8/S9 parity: persist geometry+APRIL, reload, join with filter on."""
    import ray.data as rd
    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.april import load_april, persist_april
    KW = dict(bounds=(0.0, 0.0, 100.0, 50.0), min_edge=2.0, max_edge=10.0,
              min_v=4, max_v=10)
    tr = table_layer("polygons", 80, seed=17, **KW)
    ts = table_layer("polygons", 80, seed=18, **KW)
    d1, d2 = str(tmp_path / "r"), str(tmp_path / "s")
    persist_april(rd.from_arrow(tr), d1, (0, 0, 100, 50), 8)
    persist_april(rd.from_arrow(ts), d2, (0, 0, 100, 50), 8)
    r = load_april(d1)
    assert "april_all" in r.schema().names
    from hecatoncheir_ray.april import april_meta_of
    assert april_meta_of(r) == {"bounds": [0.0, 0.0, 100.0, 50.0],
                                "order": 8}
    # april_n matches the persisted order -> the join REUSES the columns
    cfg = EngineConfig(dataspace=(0, 0, 100, 50), ppd=8, april_n=8)
    got = sorted((x["r_id"], x["s_id"]) for x in
                 spatial_join(load_april(d1), load_april(d2),
                              "covered_by", cfg).take_all())
    exp = sorted((x["r_id"], x["s_id"]) for x in
                 spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                              "covered_by", cfg).take_all())
    assert got == exp


def test_april_persist_mismatch_regenerates(ray_session, tmp_path):
    """A persisted raster whose (bounds, order) disagree with the join's
    cfg must be REGENERATED, not reused (ADVICE r2: mixing raster spaces
    silently corrupts the interval filter)."""
    import ray.data as rd
    from hecatoncheir_ray import EngineConfig, spatial_join
    from hecatoncheir_ray.april import load_april, persist_april
    KW = dict(bounds=(0.0, 0.0, 100.0, 50.0), min_edge=2.0, max_edge=10.0,
              min_v=4, max_v=10)
    tr = table_layer("polygons", 60, seed=27, **KW)
    ts = table_layer("polygons", 60, seed=28, **KW)
    d1, d2 = str(tmp_path / "r8"), str(tmp_path / "s6")
    persist_april(rd.from_arrow(tr), d1, (0, 0, 100, 50), 8)
    # wrong order AND wrong bounds vs the join below
    persist_april(rd.from_arrow(ts), d2, (0, 0, 50, 25), 6)
    cfg = EngineConfig(dataspace=(0, 0, 100, 50), ppd=8, april_n=8)
    got = sorted((x["r_id"], x["s_id"]) for x in
                 spatial_join(load_april(d1), load_april(d2),
                              "intersects", cfg).take_all())
    exp = sorted((x["r_id"], x["s_id"]) for x in
                 spatial_join(rd.from_arrow(tr), rd.from_arrow(ts),
                              "intersects", cfg).take_all())
    assert got == exp


@pytest.mark.parametrize("order", [6, 10])
def test_rasterize_batch_equivalence(order):
    """rasterize_batch == rasterize_geometry row by row, on a mixed layer
    of polygons/points/lines/boxes incl. out-of-dataspace sentinels."""
    import pyarrow as pa
    from hecatoncheir_ray.april import rasterize_batch
    from hecatoncheir_ray.stages.assign import geoms_from_table

    parts = [table_layer("polygons", 40, seed=31, bounds=BOUNDS,
                         min_edge=1.0, max_edge=8.0, min_v=4, max_v=24),
             table_layer("points", 20, seed=32, bounds=BOUNDS),
             table_layer("linestrings", 20, seed=33, bounds=BOUNDS,
                         min_v=2, max_v=6, step=3.0),
             table_layer("boxes", 20, seed=34, bounds=BOUNDS,
                         min_edge=1.0, max_edge=6.0),
             # out-of-dataspace rows -> sentinel empty lists
             table_layer("polygons", 5, seed=35,
                         bounds=(-20.0, -20.0, -1.0, -1.0),
                         min_edge=1.0, max_edge=4.0, min_v=4, max_v=8)]
    t = pa.concat_tables(parts)
    ids, gtypes, offs, vals, *_ = geoms_from_table(t)
    a_vals, a_offs, f_vals, f_offs = rasterize_batch(gtypes, offs, vals,
                                                     BOUNDS, order)
    n_sentinel = 0
    for i in range(len(ids)):
        a, f = rasterize_geometry(int(gtypes[i]), vals[offs[i]:offs[i + 1]],
                                  BOUNDS, order)
        ba = a_vals[a_offs[i]:a_offs[i + 1]]
        bf = f_vals[f_offs[i]:f_offs[i + 1]]
        np.testing.assert_array_equal(ba, a, err_msg=f"ALL row {i}")
        np.testing.assert_array_equal(bf, f, err_msg=f"FULL row {i}")
        n_sentinel += len(a) == 0
    # at least the 5 planted out-of-dataspace rows (random-walk lines may
    # legitimately escape the bounds too -- both paths agree regardless)
    assert n_sentinel >= 5


def test_interval_pair_ops_vs_scalar():
    """Vectorized pair interval joins == scalar loops, random lists."""
    from hecatoncheir_ray.april import (intervals_contained_pairs,
                                        intervals_intersect_pairs)
    rng = np.random.default_rng(3)
    lists = []
    for _ in range(60):
        k = rng.integers(0, 6)
        edges = np.sort(rng.choice(200, size=2 * k, replace=False)) \
            .astype(np.uint64)
        lists.append(edges)
    offs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in lists], out=offs[1:])
    vals = (np.concatenate(lists) if offs[-1] else
            np.zeros(0, dtype=np.uint64))
    a_rows = rng.integers(0, 60, size=300)
    b_rows = rng.integers(0, 60, size=300)
    got_i = intervals_intersect_pairs(vals, offs, a_rows, vals, offs,
                                      b_rows)
    got_c = intervals_contained_pairs(vals, offs, a_rows, vals, offs,
                                      b_rows)
    exp_i = np.array([intervals_intersect(lists[a], lists[b])
                      for a, b in zip(a_rows, b_rows)])
    exp_c = np.array([intervals_contained(lists[a], lists[b])
                      for a, b in zip(a_rows, b_rows)])
    np.testing.assert_array_equal(got_i, exp_i)
    np.testing.assert_array_equal(got_c, exp_c)


def test_order16_corner_no_overflow():
    """ADVICE r1: at order 16 an interval ending at the max Hilbert cell
    needs end = 2^32, which wrapped to 0 in uint32 storage and made a
    corner-hugging box TRUE_NEGATIVE against itself."""
    from hecatoncheir_ray.geometry.core import GT_BOX as _B
    bounds = (0.0, 0.0, 1.0, 1.0)
    box = np.array([0.9999, 0.0, 1.0, 0.0001])   # (maxx, miny) corner
    a, f = rasterize_geometry(_B, box, bounds, 16)
    assert len(a) > 0
    assert a.dtype == np.uint64
    s, e = a[0::2], a[1::2]
    assert (e > s).all()                          # no wrapped interval
    assert int(a.max()) <= 1 << 32
    assert april_filter_predicate("intersects", a, f, a, f) \
        != TRUE_NEGATIVE


def test_topology_dispatch_parity_and_superset():
    """Round-4 containment dispatch (_april_topology_batch):

    1. SOUND — every decided pair agrees with the exact geometric
       find_relation for its MBR case;
    2. SUPERSET — it decides at least every pair the round-3 rule set
       decided, except equal-A-list pairs (deliberately routed to the
       equality refinement now: an exactly-equal pair must report
       TR_EQUAL, not the premature INSIDE the old shortcut gave).
    """
    from hecatoncheir_ray.april import intervals_contained_pairs
    from hecatoncheir_ray.geometry import find_relation
    from hecatoncheir_ray.geometry.predicates import (MBR_INTERSECT,
                                                      MBR_EQUAL,
                                                      MBR_R_IN_S,
                                                      MBR_S_IN_R,
                                                      relate_mbrs_batch)
    from hecatoncheir_ray.stages.sweep import (_april_intersects_decision,
                                               _april_topology_batch)

    t1 = table_layer("polygons", 30, seed=12, bounds=(8, 8, 56, 56),
                     min_edge=1.5, max_edge=6.0, min_v=4, max_v=10)
    t2 = table_layer("polygons", 30, seed=13, bounds=(4, 4, 60, 60),
                     min_edge=8.0, max_edge=24.0, min_v=5, max_v=12)
    rows = t1.to_pylist() + t2.to_pylist()
    # append an exact duplicate of row 0 to force an equal-A-list pair
    rows.append(dict(rows[0]))
    a_list, f_list = [], []
    for r in rows:
        a, f = rasterize_geometry(GT_POLYGON, np.asarray(r["coords"]),
                                  BOUNDS, ORDER)
        a_list.append(np.asarray(a, dtype=np.uint64))
        f_list.append(np.asarray(f, dtype=np.uint64))
    ao = np.concatenate([[0], np.cumsum([len(x) for x in a_list])]) \
        .astype(np.int64)
    fo = np.concatenate([[0], np.cumsum([len(x) for x in f_list])]) \
        .astype(np.int64)
    av = (np.concatenate(a_list) if a_list else
          np.zeros(0, np.uint64)).astype(np.uint64)
    fv = (np.concatenate(f_list) if f_list else
          np.zeros(0, np.uint64)).astype(np.uint64)
    april = (ao, av, fo, fv)

    n = len(rows)
    ri = np.repeat(np.arange(n), n)
    si = np.tile(np.arange(n), n)
    keep = ri != si
    ri, si = ri[keep], si[keep]
    mb = np.array([[r["minx"], r["miny"], r["maxx"], r["maxy"]]
                   for r in rows])
    cases = relate_mbrs_batch(mb[ri, 0], mb[ri, 1], mb[ri, 2], mb[ri, 3],
                              mb[si, 0], mb[si, 1], mb[si, 2], mb[si, 3])
    hit, neg = _april_intersects_decision(april, ri, si)
    interiors = hit & ~neg
    rel4, dec4 = _april_topology_batch(april, ri, si, cases, interiors)

    # soundness vs the exact classifier
    checked = 0
    for k in np.nonzero(dec4)[0].tolist():
        i, j = int(ri[k]), int(si[k])
        exact = find_relation(
            GT_POLYGON, np.asarray(rows[i]["coords"]),
            GT_POLYGON, np.asarray(rows[j]["coords"]), int(cases[k]))
        assert rel4[k] == exact, (i, j, int(cases[k]), rel4[k], exact)
        checked += 1
    assert checked > 0          # the dispatch decides a meaningful share

    # round-3 rule set, reimplemented inline
    c_rs_f = intervals_contained_pairs(av, ao, ri, fv, fo, si)
    c_rs_a = intervals_contained_pairs(av, ao, ri, av, ao, si)
    c_sr_f = intervals_contained_pairs(av, ao, si, fv, fo, ri)
    c_sr_a = intervals_contained_pairs(av, ao, si, av, ao, ri)
    cont = interiors & (cases != MBR_INTERSECT)
    dec3 = cont & (
        ((cases == MBR_R_IN_S) & (c_rs_f | (~c_rs_f & ~c_rs_a)))
        | ((cases == MBR_S_IN_R) & (c_sr_f | (~c_sr_f & ~c_sr_a)))
        | ((cases == MBR_EQUAL) & (c_rs_f | (~c_rs_f & c_sr_f)
                                   | (~c_rs_f & ~c_sr_f
                                      & ~c_rs_a & ~c_sr_a))))
    match = c_rs_a & c_sr_a
    lost = dec3 & ~dec4
    assert not (lost & ~match).any()
    # the duplicate pair exists, is an equal-A-list containment case,
    # and correctly routes to refinement instead of a premature INSIDE
    dup = (ri == n - 1) | (si == n - 1)
    eqpairs = dup & (cases == MBR_EQUAL) & match & interiors
    assert eqpairs.any()
    assert not dec4[eqpairs].any()
