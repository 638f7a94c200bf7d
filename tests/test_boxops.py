"""Vectorized box kernels vs the general per-pair DE-9IM evaluator."""

import numpy as np

from hecatoncheir_ray.geometry import GT_BOX, eval_predicate
from hecatoncheir_ray.geometry.boxops import (BOX_PREDS, box_find_relation,
                                              box_predicate_mask)
from hecatoncheir_ray.geometry.predicates import (find_relation,
                                                  relate_mbrs_batch)


def _random_boxes(rng, n, grid_snap=False):
    c = rng.uniform(0, 20, (n, 2))
    w = rng.uniform(0.5, 5, (n, 2))
    if grid_snap:     # integer coords -> exact touches / equal edges common
        c = np.round(c)
        w = np.maximum(np.round(w), 1.0)
    return np.concatenate([c - w, c + w], axis=1)  # minx,miny,maxx,maxy


def _candidates(rm, sm):
    keep = ((rm[:, 0] <= sm[:, 2]) & (sm[:, 0] <= rm[:, 2])
            & (rm[:, 1] <= sm[:, 3]) & (sm[:, 1] <= rm[:, 3]))
    return rm[keep], sm[keep]


def test_box_predicates_vs_relate():
    rng = np.random.default_rng(0)
    for snap in (False, True):
        rm = _random_boxes(rng, 400, snap)
        sm = _random_boxes(rng, 400, snap)
        rm, sm = _candidates(rm, sm)
        assert len(rm) > 50
        for pred in BOX_PREDS:
            fast = box_predicate_mask(pred, rm, sm)
            for k in range(len(rm)):
                cr = np.array([rm[k, 0], rm[k, 1], rm[k, 2], rm[k, 3]])
                cs = np.array([sm[k, 0], sm[k, 1], sm[k, 2], sm[k, 3]])
                exact = eval_predicate(pred, GT_BOX, cr, GT_BOX, cs)
                assert fast[k] == exact, (pred, k, cr, cs)


def test_box_find_relation_vs_general():
    rng = np.random.default_rng(1)
    for snap in (False, True):
        rm = _random_boxes(rng, 400, snap)
        sm = _random_boxes(rng, 400, snap)
        rm, sm = _candidates(rm, sm)
        cases = relate_mbrs_batch(rm[:, 0], rm[:, 1], rm[:, 2], rm[:, 3],
                                  sm[:, 0], sm[:, 1], sm[:, 2], sm[:, 3])
        fast = box_find_relation(rm, sm, cases)
        for k in range(len(rm)):
            cr = np.array([rm[k, 0], rm[k, 1], rm[k, 2], rm[k, 3]])
            cs = np.array([sm[k, 0], sm[k, 1], sm[k, 2], sm[k, 3]])
            exact = find_relation(GT_BOX, cr, GT_BOX, cs, int(cases[k]))
            assert fast[k] == exact, (k, cr, cs, fast[k], exact)
