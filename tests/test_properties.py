"""Property-based tests (hypothesis) for the geometry core.

These complement the seeded random sweeps: hypothesis explores and SHRINKS
adversarial coordinates (tiny slivers, exact ties, giant magnitudes) that
fixed seeds miss.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from hecatoncheir_ray.config import GridSpec
from hecatoncheir_ray.geometry import (GT_BOX, GT_POINT, eval_predicate,
                                       find_relation, predicate, relate,
                                       relate_mbrs)
from hecatoncheir_ray.geometry.boxops import box_find_relation, box_predicate_mask
from hecatoncheir_ray.geometry.predicates import relate_mbrs_batch
from hecatoncheir_ray.grid import explode_cells, point_cell, ref_point_key

# Coordinates quantized to 1e-4: exact ties/touches are frequent (the
# interesting discrete cases) while knife-edge sub-epsilon gaps — where
# the per-edge-length epsilon scaling makes touch classification
# legitimately direction-dependent (see predicates._seg_params) — cannot
# occur.  Real data (degrees) behaves like this, not like 1e-308 floats.
coord = st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                  allow_infinity=False, width=64).map(
                      lambda v: round(v, 4))


@st.composite
def boxes(draw):
    x0, x1 = sorted((draw(coord), draw(coord)))
    y0, y1 = sorted((draw(coord), draw(coord)))
    if x1 - x0 < 1e-3:
        x1 = x0 + 1e-3
    if y1 - y0 < 1e-3:
        y1 = y0 + 1e-3
    return np.array([x0, y0, x1, y1])


@settings(max_examples=200, deadline=None)
@given(boxes(), boxes())
def test_box_predicate_consistency(a, b):
    """Predicate algebra invariants hold for arbitrary box pairs."""
    m = relate(GT_BOX, a, GT_BOX, b)
    inter = predicate("intersects", GT_BOX, a, GT_BOX, b)
    assert inter == (not predicate("disjoint", GT_BOX, a, GT_BOX, b))
    if predicate("inside", GT_BOX, a, GT_BOX, b):
        assert predicate("covered_by", GT_BOX, a, GT_BOX, b)
    if predicate("covered_by", GT_BOX, a, GT_BOX, b):
        assert inter
    assert predicate("contains", GT_BOX, a, GT_BOX, b) == \
        predicate("inside", GT_BOX, b, GT_BOX, a)
    if predicate("meet", GT_BOX, a, GT_BOX, b):
        assert inter and not m[0, 0]
    # transpose symmetry of the matrix
    mt = relate(GT_BOX, b, GT_BOX, a)
    assert (m.T == mt).all()


@settings(max_examples=200, deadline=None)
@given(boxes(), boxes())
def test_box_fastpath_matches_relate(a, b):
    """Vectorized box kernels == general evaluator, any overlap pair."""
    if (a[0] > b[2] or b[0] > a[2] or a[1] > b[3] or b[1] > a[3]):
        return   # kernels assume candidate pairs
    rm, sm = a[None, :], b[None, :]
    for pred in ("intersects", "inside", "covered_by", "contains",
                 "covers", "equal", "meet", "disjoint"):
        assert bool(box_predicate_mask(pred, rm, sm)[0]) == \
            eval_predicate(pred, GT_BOX, a, GT_BOX, b), pred
    cases = relate_mbrs_batch(rm[:, 0], rm[:, 1], rm[:, 2], rm[:, 3],
                              sm[:, 0], sm[:, 1], sm[:, 2], sm[:, 3])
    assert int(box_find_relation(rm, sm, cases)[0]) == \
        find_relation(GT_BOX, a, GT_BOX, b, int(cases[0]))


def test_crossing_slivers_regression():
    """Two thin boxes overlapping near a corner: the segment kernel's
    scaled epsilon used to swallow the crossing (found by hypothesis);
    box x box now uses exact interval overlap."""
    a = np.array([0.0, -100.0, 1e-3, 0.0])
    b = np.array([-1e-4, -1e-4, 9e-4, 100.0])
    assert eval_predicate("intersects", GT_BOX, a, GT_BOX, b)
    assert not eval_predicate("disjoint", GT_BOX, a, GT_BOX, b)
    assert bool(box_predicate_mask("intersects", a[None], b[None])[0])


@settings(max_examples=200, deadline=None)
@given(boxes(), boxes())
def test_refpoint_owned_by_both(a, b):
    """The dedup reference point lands in a cell overlapped by BOTH MBRs
    (the exactly-once guarantee of the PBSM rule)."""
    if (a[0] > b[2] or b[0] > a[2] or a[1] > b[3] or b[1] > a[3]):
        return
    grid = GridSpec(-1000, -1000, 1000, 1000, ppd=16)
    rx, ry = max(a[0], b[0]), max(a[1], b[1])
    own = ref_point_key(grid, np.array([rx]), np.array([ry]), None, 4)[0]
    _, ca = explode_cells(grid, *[np.array([v]) for v in a])
    _, cb = explode_cells(grid, *[np.array([v]) for v in b])
    assert own in set(ca) and own in set(cb)


@settings(max_examples=150, deadline=None)
@given(coord, coord)
def test_point_cell_in_range(x, y):
    grid = GridSpec(-100, -100, 100, 100, ppd=8)
    c = point_cell(grid, np.array([x]), np.array([y]))[0]
    assert 0 <= c < 64


@settings(max_examples=150, deadline=None)
@given(boxes(), boxes())
def test_mbr_case_antisymmetry(a, b):
    """R_IN_S and S_IN_R swap under argument transposition (modulo the
    reference's tie precedence at exactly-equal edges)."""
    c1 = relate_mbrs(a[0], a[1], a[2], a[3], b[0], b[1], b[2], b[3])
    c2 = relate_mbrs(b[0], b[1], b[2], b[3], a[0], a[1], a[2], a[3])
    from hecatoncheir_ray.geometry import (MBR_EQUAL, MBR_INTERSECT,
                                           MBR_R_IN_S, MBR_S_IN_R)
    if c1 == MBR_EQUAL:
        assert c2 == MBR_EQUAL
    elif c1 == MBR_INTERSECT:
        assert c2 == MBR_INTERSECT
    elif c1 == MBR_R_IN_S:
        assert c2 in (MBR_S_IN_R, MBR_R_IN_S)   # ties keep block order
    elif c1 == MBR_S_IN_R:
        assert c2 in (MBR_R_IN_S, MBR_S_IN_R)


# --- hex index (pipelines/hexgrid.py) ---------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.floats(-100.0, 100.0, allow_nan=False, allow_infinity=False),
       st.floats(-100.0, 100.0, allow_nan=False, allow_infinity=False),
       st.sampled_from([0.05, 0.37, 0.5, 2.0]))
def test_hex_nearest_center_property(x, y, size):
    """Cube rounding assigns every point to the hex whose center is at
    least as close as any of the 6 neighbors (hex Voronoi property) and
    within the circumradius — for arbitrary floats, not just the seeded
    sweep (hypothesis shrinks boundary/tie cases)."""
    import numpy as np
    from hecatoncheir_ray.pipelines.hexgrid import hex_axial, hex_center
    xa, ya = np.array([x]), np.array([y])
    q, r = hex_axial(xa, ya, size)
    cx, cy = hex_center(q, r, size)
    d0 = float(np.hypot(xa - cx, ya - cy)[0])
    tol = 1e-9 * max(1.0, abs(x), abs(y))
    assert d0 <= size + tol
    for dq, dr in [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]:
        nx, ny = hex_center(q + dq, r + dr, size)
        assert d0 <= float(np.hypot(xa - nx, ya - ny)[0]) + tol


@settings(max_examples=300, deadline=None)
@given(st.integers(-(1 << 20) + 1, (1 << 20) - 1),
       st.integers(-(1 << 20) + 1, (1 << 20) - 1))
def test_hex_id_packing_bijective(q, r):
    """hex_id packs (q, r) into one int64 without collision across the
    whole supported axial range (20 bits + sign per axis)."""
    import numpy as np
    from hecatoncheir_ray.pipelines.hexgrid import hex_id
    h = int(hex_id(np.array([q]), np.array([r]))[0])
    span = 1 << 21
    assert h // span - (1 << 20) == q
    assert h % span - (1 << 20) == r
