"""Fully-vectorized predicate / FIND_RELATION kernels for box-box and
point-areal candidate pairs (geometry == MBR for boxes, so every predicate
reduces to coordinate comparisons; points reduce to a point-in-ring
classification).

These mirror the general relate()-based paths bit-for-bit on the supported
cases (cross-checked in tests/test_boxops.py against the per-pair evaluator)
and carry the hot join workloads without any per-pair Python.

Candidate pairs are assumed to have inclusively-overlapping MBRs (the
upstream filter guarantees it).
"""

from __future__ import annotations

import numpy as np

from .predicates import (_ON_EPS, MBR_EQUAL, MBR_INTERSECT, MBR_R_IN_S,
                         MBR_S_IN_R, TR_CONTAINS, TR_COVERED_BY, TR_COVERS,
                         TR_DISJOINT, TR_EQUAL, TR_INSIDE, TR_INTERSECT,
                         TR_MEET)

BOX_PREDS = ("intersects", "disjoint", "inside", "covered_by", "contains",
             "covers", "equal", "meet")


def box_predicate_mask(name: str, rm: np.ndarray, sm: np.ndarray,
                       eps: float = _ON_EPS) -> np.ndarray:
    """Keep-mask for candidate box pairs.  rm/sm: (n,4) minx,miny,maxx,maxy."""
    if name == "intersects":
        return np.ones(len(rm), dtype=bool)
    if name == "disjoint":
        return np.zeros(len(rm), dtype=bool)
    cov_rs = ((rm[:, 0] >= sm[:, 0]) & (rm[:, 1] >= sm[:, 1])
              & (rm[:, 2] <= sm[:, 2]) & (rm[:, 3] <= sm[:, 3]))
    cov_sr = ((sm[:, 0] >= rm[:, 0]) & (sm[:, 1] >= rm[:, 1])
              & (sm[:, 2] <= rm[:, 2]) & (sm[:, 3] <= rm[:, 3]))
    if name == "covered_by":
        return cov_rs
    if name == "covers":
        return cov_sr
    if name == "inside":     # boost within: strict, no boundary contact
        return ((rm[:, 0] > sm[:, 0]) & (rm[:, 1] > sm[:, 1])
                & (rm[:, 2] < sm[:, 2]) & (rm[:, 3] < sm[:, 3]))
    if name == "contains":
        return ((sm[:, 0] > rm[:, 0]) & (sm[:, 1] > rm[:, 1])
                & (sm[:, 2] < rm[:, 2]) & (sm[:, 3] < rm[:, 3]))
    if name == "equal":
        return ((np.abs(rm[:, 0] - sm[:, 0]) <= eps)
                & (np.abs(rm[:, 1] - sm[:, 1]) <= eps)
                & (np.abs(rm[:, 2] - sm[:, 2]) <= eps)
                & (np.abs(rm[:, 3] - sm[:, 3]) <= eps))
    if name == "meet":       # interiors disjoint: overlap degenerate in x|y
        ox = np.minimum(rm[:, 2], sm[:, 2]) - np.maximum(rm[:, 0], sm[:, 0])
        oy = np.minimum(rm[:, 3], sm[:, 3]) - np.maximum(rm[:, 1], sm[:, 1])
        return (ox <= eps) | (oy <= eps)
    raise ValueError(name)


def box_find_relation(rm: np.ndarray, sm: np.ndarray,
                      mbr_cases: np.ndarray, eps: float = _ON_EPS
                      ) -> np.ndarray:
    """FIND_RELATION for candidate box pairs (mirrors the mask dispatch of
    refinement::topology for areal pairs; see predicates.find_relation).

    Boxes covered/covering always have interior overlap, so the
    contains/inside sub-check always fires: S_IN_R -> CONTAINS,
    R_IN_S -> INSIDE; MBR_EQUAL -> equal/contains/inside/intersect;
    MBR_INTERSECT -> meet (degenerate overlap) or intersect.
    """
    rel = np.full(len(rm), TR_INTERSECT, dtype=np.int8)
    eq = box_predicate_mask("equal", rm, sm, eps)
    cov_sr = box_predicate_mask("covers", rm, sm)
    cov_rs = box_predicate_mask("covered_by", rm, sm)
    meet = box_predicate_mask("meet", rm, sm, eps)
    m_eq = mbr_cases == MBR_EQUAL
    rel[m_eq & eq] = TR_EQUAL
    rel[m_eq & ~eq & cov_sr] = TR_CONTAINS
    rel[m_eq & ~eq & ~cov_sr & cov_rs] = TR_INSIDE
    rel[mbr_cases == MBR_S_IN_R] = TR_CONTAINS
    rel[mbr_cases == MBR_R_IN_S] = TR_INSIDE
    m_int = mbr_cases == MBR_INTERSECT
    rel[m_int & meet] = TR_MEET
    return rel


# ---------------------------------------------------------------------------
# point-areal vectorized find_relation (given PiP classification)
# ---------------------------------------------------------------------------

def point_areal_find_relation(cls: np.ndarray, mbr_cases: np.ndarray,
                              point_is_r: bool) -> np.ndarray:
    """cls: int8 PiP result per pair (1 in / 0 on / -1 out) of the point vs
    the areal geometry.  Mirrors the specialized refinement outcomes:

    point==R (areal==S):
      MBR_R_IN_S: in->INSIDE, on->COVERED_BY, out->DISJOINT
      MBR_INTERSECT: in->INTERSECT, on->MEET, out->DISJOINT
    point==S (areal==R):
      MBR_S_IN_R: in->CONTAINS, on->COVERS, out->DISJOINT
      MBR_INTERSECT: in->INTERSECT, on->MEET, out->DISJOINT
    (MBR_EQUAL / the impossible containment direction fall back upstream.)
    """
    rel = np.full(len(cls), TR_INTERSECT, dtype=np.int8)
    contained_case = MBR_R_IN_S if point_is_r else MBR_S_IN_R
    m_c = mbr_cases == contained_case
    m_i = mbr_cases == MBR_INTERSECT
    rel[(m_c | m_i) & (cls == -1)] = TR_DISJOINT
    if point_is_r:
        rel[m_c & (cls == 1)] = TR_INSIDE
        rel[m_c & (cls == 0)] = TR_COVERED_BY
    else:
        rel[m_c & (cls == 1)] = TR_CONTAINS
        rel[m_c & (cls == 0)] = TR_COVERS
    rel[m_i & (cls == 0)] = TR_MEET
    rel[m_i & (cls == 1)] = TR_INTERSECT
    return rel


def point_areal_handled_cases(mbr_cases: np.ndarray,
                              point_is_r: bool) -> np.ndarray:
    """Mask of pairs the vectorized path covers (rest -> per-pair fallback)."""
    contained_case = MBR_R_IN_S if point_is_r else MBR_S_IN_R
    return (mbr_cases == contained_case) | (mbr_cases == MBR_INTERSECT)
