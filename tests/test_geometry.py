"""Geometry-core unit tests: WKT/WKB codecs, points_in_ring, relate/DE-9IM,
named predicates, FIND_RELATION dispatch.

Oracle strategy (no shapely in this environment): hand-built golden cases
for every matrix-affecting configuration, plus a Monte-Carlo interior-sampling
oracle that independently validates the I/E matrix cells for random polygon
pairs (boundary cells are exercised by the hand cases).
"""

import numpy as np
import pytest

from hecatoncheir_ray.geometry import (GT_BOX, GT_LINESTRING, GT_POINT,
                                       GT_POLYGON, eval_predicate,
                                       fast_intersects, find_relation,
                                       format_wkt, from_wkb, mbr_of,
                                       parse_wkt, points_in_ring, predicate,
                                       relate, relate_mbrs, to_wkb)
from hecatoncheir_ray.geometry.predicates import (MBR_EQUAL, MBR_INTERSECT,
                                                  MBR_R_IN_S, MBR_S_IN_R,
                                                  TR_CONTAINS, TR_COVERED_BY,
                                                  TR_COVERS, TR_DISJOINT,
                                                  TR_EQUAL, TR_INSIDE,
                                                  TR_INTERSECT, TR_MEET)


def P(*pts):
    return np.array(pts, dtype=np.float64).reshape(-1)


SQ = (GT_POLYGON, P((0, 0), (4, 0), (4, 4), (0, 4)))            # unit-ish square
SQ_IN = (GT_POLYGON, P((1, 1), (3, 1), (3, 3), (1, 3)))          # strictly inside
SQ_EDGE = (GT_POLYGON, P((0, 1), (2, 1), (2, 3), (0, 3)))        # touches left edge from inside
SQ_OUT = (GT_POLYGON, P((10, 10), (12, 10), (12, 12), (10, 12)))  # disjoint
SQ_TOUCH = (GT_POLYGON, P((4, 0), (8, 0), (8, 4), (4, 4)))       # shares right edge
SQ_CORNER = (GT_POLYGON, P((4, 4), (6, 4), (6, 6), (4, 6)))      # corner touch
SQ_OVER = (GT_POLYGON, P((2, 2), (6, 2), (6, 6), (2, 6)))        # overlaps


# --- codecs ---------------------------------------------------------------

def test_wkt_roundtrip():
    g = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert g is not None and g[0] == GT_POLYGON
    assert len(g[1]) == 8  # unclosed 4 vertices
    txt = format_wkt(*g)
    g2 = parse_wkt(txt)
    np.testing.assert_allclose(g[1], g2[1])
    assert parse_wkt("MULTIPOLYGON (((0 0,1 0,1 1,0 0)))") is None
    assert parse_wkt("POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))") is None
    pt = parse_wkt("POINT (3.5 -2)")
    assert pt[0] == GT_POINT and tuple(pt[1]) == (3.5, -2.0)
    ls = parse_wkt("LINESTRING (0 0, 1 1, 2 0)")
    assert ls[0] == GT_LINESTRING and len(ls[1]) == 6


def test_wkb_roundtrip():
    for g in [SQ, (GT_POINT, P((1, 2))), (GT_LINESTRING, P((0, 0), (1, 1)))]:
        buf = to_wkb(*g)
        gt, coords = from_wkb(buf)
        if g[0] == GT_POLYGON:
            assert gt == GT_POLYGON and len(coords) == len(g[1])
        else:
            np.testing.assert_allclose(coords, g[1])


def test_mbr():
    assert mbr_of(*SQ) == (0, 0, 4, 4)


# --- points_in_ring -------------------------------------------------------

def test_points_in_ring_basic():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    pts = np.array([[2, 2], [0, 2], [4, 4], [5, 2], [2, 0], [-1, -1],
                    [3.999999, 2]])
    out = points_in_ring(pts, ring)
    assert list(out) == [1, 0, 0, -1, 0, -1, 1]


def test_points_in_ring_concave():
    # C-shape
    ring = np.array([[0, 0], [6, 0], [6, 2], [2, 2], [2, 4], [6, 4],
                     [6, 6], [0, 6]], dtype=float)
    pts = np.array([[1, 3], [4, 3], [4, 1], [4, 5], [7, 3]])
    assert list(points_in_ring(pts, ring)) == [1, -1, 1, 1, -1]


# --- polygon x polygon relate + predicates --------------------------------

def test_pp_disjoint():
    m = relate(*SQ, *SQ_OUT)
    assert not m[0, 0] and not m[1, 1]
    assert eval_predicate("disjoint", *SQ, *SQ_OUT)
    assert not fast_intersects(*SQ, *SQ_OUT)


def test_pp_overlap():
    assert fast_intersects(*SQ, *SQ_OVER)
    m = relate(*SQ, *SQ_OVER)
    assert m[0, 0] and m[0, 2] and m[2, 0] and m[1, 1]
    assert not predicate("inside", *SQ, *SQ_OVER)
    assert not predicate("meet", *SQ, *SQ_OVER)


def test_pp_edge_touch():
    # shares the edge x=4: touches, interiors disjoint
    assert fast_intersects(*SQ, *SQ_TOUCH)
    assert predicate("meet", *SQ, *SQ_TOUCH)
    assert not predicate("inside", *SQ, *SQ_TOUCH)
    assert predicate("disjoint", *SQ, *SQ_OUT)


def test_pp_corner_touch():
    assert fast_intersects(*SQ, *SQ_CORNER)
    assert predicate("meet", *SQ, *SQ_CORNER)


def test_pp_containment():
    assert predicate("inside", *SQ_IN, *SQ)          # strict within
    assert predicate("covered_by", *SQ_IN, *SQ)
    assert predicate("contains", *SQ, *SQ_IN)
    assert predicate("covers", *SQ, *SQ_IN)
    # boundary-touching containment: covered_by yes, strict within no
    assert predicate("covered_by", *SQ_EDGE, *SQ)
    assert not predicate("inside", *SQ_EDGE, *SQ)
    assert predicate("covers", *SQ, *SQ_EDGE)
    assert not predicate("contains", *SQ, *SQ_EDGE)


def test_pp_equal():
    assert predicate("equal", *SQ, *SQ)
    rot = (GT_POLYGON, P((4, 0), (4, 4), (0, 4), (0, 0)))  # same ring, rotated start
    assert predicate("equal", *SQ, *rot)
    assert not predicate("equal", *SQ, *SQ_IN)


def test_pp_cross_shape():
    # horizontal bar x vertical bar (plus sign): interiors cross,
    # no vertex of either inside the other
    H = (GT_POLYGON, P((0, 2), (6, 2), (6, 4), (0, 4)))
    V = (GT_POLYGON, P((2, 0), (4, 0), (4, 6), (2, 6)))
    assert fast_intersects(H, V) if False else fast_intersects(*H, *V)
    m = relate(*H, *V)
    assert m[0, 0] and m[0, 2] and m[2, 0]
    assert not predicate("meet", *H, *V)


def test_pp_shared_edge_overlap():
    # A=(0,0,2,2), B=(1,0,3,2): overlap with collinear boundary pieces
    A = (GT_POLYGON, P((0, 0), (2, 0), (2, 2), (0, 2)))
    B = (GT_POLYGON, P((1, 0), (3, 0), (3, 2), (1, 2)))
    m = relate(*A, *B)
    assert m[0, 0] and m[0, 2] and m[2, 0] and m[1, 1]
    assert not predicate("meet", *A, *B)
    assert fast_intersects(*A, *B)


# --- areal x line ----------------------------------------------------------

def test_al_cases():
    L_in = (GT_LINESTRING, P((1, 1), (3, 3)))
    L_cross = (GT_LINESTRING, P((-1, 2), (5, 2)))
    L_touch = (GT_LINESTRING, P((-1, -1), (0, 2)))     # endpoint on boundary
    L_out = (GT_LINESTRING, P((5, 5), (6, 6)))
    L_edge = (GT_LINESTRING, P((0, 1), (0, 3)))        # runs along boundary
    assert predicate("inside", *L_in, *SQ)
    assert predicate("covered_by", *L_in, *SQ)
    assert predicate("contains", *SQ, *L_in)
    assert fast_intersects(*SQ, *L_cross)
    assert not predicate("covered_by", *L_cross, *SQ)
    assert predicate("meet", *SQ, *L_touch)
    assert predicate("disjoint", *SQ, *L_out)
    assert predicate("meet", *SQ, *L_edge)             # on boundary only
    assert predicate("covered_by", *L_edge, *SQ)
    assert not predicate("inside", *L_edge, *SQ)


# --- line x line -----------------------------------------------------------

def test_ll_cases():
    L1 = (GT_LINESTRING, P((0, 0), (4, 4)))
    L2 = (GT_LINESTRING, P((0, 4), (4, 0)))            # proper cross
    L3 = (GT_LINESTRING, P((4, 4), (8, 0)))            # shares endpoint with L1
    L4 = (GT_LINESTRING, P((1, 1), (2, 2)))            # collinear sub-segment
    L5 = (GT_LINESTRING, P((0, 1), (1, 0)))            # disjoint from L3
    assert fast_intersects(*L1, *L2)
    assert not predicate("meet", *L1, *L2)             # interiors cross
    assert predicate("meet", *L1, *L3)                 # endpoint touch
    assert predicate("covered_by", *L4, *L1)
    assert predicate("inside", *L4, *L1)               # strictly interior
    assert predicate("disjoint", *L3, *L5)
    assert predicate("equal", *L1, *L1)


# --- point cases -----------------------------------------------------------

def test_point_cases():
    pin = (GT_POINT, P((2, 2)))
    pon = (GT_POINT, P((0, 2)))
    pout = (GT_POINT, P((9, 9)))
    assert predicate("inside", *pin, *SQ)
    assert predicate("covered_by", *pon, *SQ)
    assert not predicate("inside", *pon, *SQ)          # boost strict within
    assert predicate("meet", *pon, *SQ)
    assert predicate("disjoint", *pout, *SQ)
    assert predicate("equal", *pin, GT_POINT, P((2, 2)))
    L = (GT_LINESTRING, P((0, 0), (4, 4)))
    assert predicate("inside", GT_POINT, P((2, 2)), *L)
    assert predicate("meet", GT_POINT, P((0, 0)), *L)  # on line endpoint
    assert not predicate("inside", GT_POINT, P((0, 0)), *L)


# --- box -------------------------------------------------------------------

def test_box():
    B = (GT_BOX, P((0, 0), (4, 4)))
    assert predicate("equal", *B, *SQ)
    assert predicate("contains", *B, *SQ_IN)
    assert eval_predicate("intersects", *B, *SQ_OVER)


# --- MBR relation dispatch -------------------------------------------------

def test_relate_mbrs():
    assert relate_mbrs(0, 0, 4, 4, 0, 0, 4, 4) == MBR_EQUAL
    assert relate_mbrs(1, 1, 3, 3, 0, 0, 4, 4) == MBR_R_IN_S
    assert relate_mbrs(0, 0, 4, 4, 1, 1, 3, 3) == MBR_S_IN_R
    # crossing MBRs: the reference's MBR_CROSS branches are dead code
    # (topology_join_filter.cpp:74,97) -> classified MBR_INTERSECT
    assert relate_mbrs(0, 2, 6, 4, 2, 0, 4, 6) == MBR_INTERSECT
    assert relate_mbrs(2, 0, 4, 6, 0, 2, 6, 4) == MBR_INTERSECT
    assert relate_mbrs(0, 0, 4, 4, 2, 2, 6, 6) == MBR_INTERSECT


def test_find_relation():
    # R strictly inside S
    assert find_relation(*SQ_IN, *SQ, MBR_R_IN_S) == TR_INSIDE
    assert find_relation(*SQ, *SQ_IN, MBR_S_IN_R) == TR_CONTAINS
    # boundary-touching containment: the reference's insideCode equals
    # coveredbyCode1 ("T*F**F***", topology.cpp:10-12) so for areal pairs
    # with II=T the inside/contains sub-check always fires -> INSIDE/CONTAINS,
    # never COVERED_BY/COVERS
    assert find_relation(*SQ_EDGE, *SQ, MBR_R_IN_S) == TR_INSIDE
    assert find_relation(*SQ, *SQ_EDGE, MBR_S_IN_R) == TR_CONTAINS
    # equal
    assert find_relation(*SQ, *SQ, MBR_EQUAL) == TR_EQUAL
    # disjoint MBR-intersecting
    A = (GT_POLYGON, P((0, 0), (1, 0), (1, 1), (0, 1)))
    Bq = (GT_POLYGON, P((2, 2), (3, 2), (3, 3), (2, 3)))
    assert find_relation(*A, *Bq, MBR_INTERSECT) == TR_DISJOINT
    # meet
    assert find_relation(*SQ, *SQ_TOUCH, MBR_INTERSECT) == TR_MEET
    # overlap
    assert find_relation(*SQ, *SQ_OVER, MBR_INTERSECT) == TR_INTERSECT


# --- Monte-Carlo interior-sampling oracle ---------------------------------

def _random_convexish(rng, cx, cy, r, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.3 * r, r, n)
    pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    return pts


@pytest.mark.parametrize("seed", range(8))
def test_mc_sampling_oracle(seed):
    """Interior/exterior DE-9IM cells agree with a dense sampling estimate."""
    rng = np.random.default_rng(seed)
    A = _random_convexish(rng, 0, 0, 2.0, rng.integers(4, 12))
    B = _random_convexish(rng, rng.uniform(-2, 2), rng.uniform(-2, 2),
                          rng.uniform(0.5, 2.5), rng.integers(4, 12))
    gA = (GT_POLYGON, A.reshape(-1))
    gB = (GT_POLYGON, B.reshape(-1))
    m = relate(*gA, *gB)
    # sample points over joint bbox
    lo = np.minimum(A.min(0), B.min(0)) - 0.1
    hi = np.maximum(A.max(0), B.max(0)) + 0.1
    pts = rng.uniform(lo, hi, size=(20000, 2))
    ca = points_in_ring(pts, A)
    cb = points_in_ring(pts, B)
    ii = bool(((ca == 1) & (cb == 1)).any())
    ie = bool(((ca == 1) & (cb == -1)).any())
    ei = bool(((ca == -1) & (cb == 1)).any())
    # sampling can only under-detect: a True sample forces True in relate
    if ii:
        assert m[0, 0]
    if ie:
        assert m[0, 2]
    if ei:
        assert m[2, 0]
    # and for fat regions (>1% of samples) relate must agree exactly
    if ((ca == 1) & (cb == 1)).mean() > 0.01:
        assert m[0, 0]
    if m[0, 0] and not ii and ((ca == 1).mean() > 0.01) and ((cb == 1).mean() > 0.01):
        # interiors intersect per relate but no sample found in a fat case:
        # only plausible for sliver overlaps; tolerate but flag via recheck
        assert ((ca >= 0) & (cb >= 0)).any()
    # intersects consistency between fast path and matrix
    assert fast_intersects(*gA, *gB) == bool(
        m[0, 0] or m[0, 1] or m[1, 0] or m[1, 1])
