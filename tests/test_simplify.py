"""Douglas-Peucker simplification: the batch-vectorized worklist
implementation vs a scalar recursive reference (identical tie rule),
the eps deviation guarantee, and the Dataset stage plumbing.
"""

import numpy as np

from hecatoncheir_ray.geometry.simplify import dp_keep_mask


def _dp_scalar(xs, ys, eps):
    """Textbook recursive DP, first-max tie rule."""
    keep = np.zeros(len(xs), dtype=bool)
    keep[0] = keep[-1] = True

    def rec(a, b):
        if b <= a + 1:
            return
        dx, dy = xs[b] - xs[a], ys[b] - ys[a]
        norm = float(np.hypot(dx, dy))
        best, bi = -1.0, -1
        for j in range(a + 1, b):
            px, py = xs[j] - xs[a], ys[j] - ys[a]
            d = (abs(dx * py - dy * px) / norm if norm > 0
                 else float(np.hypot(px, py)))
            if d > best:
                best, bi = d, j
        if best > eps:
            keep[bi] = True
            rec(a, bi)
            rec(bi, b)

    rec(0, len(xs) - 1)
    return keep


def _rand_lines(seed, n_lines, max_v=40):
    rng = np.random.RandomState(seed)
    offs = [0]
    xs, ys = [], []
    for _ in range(n_lines):
        m = rng.randint(2, max_v)
        x = np.cumsum(rng.randn(m))
        y = np.cumsum(rng.randn(m)) * 0.3
        xs.append(x)
        ys.append(y)
        offs.append(offs[-1] + m)
    return (np.concatenate(xs), np.concatenate(ys),
            np.array(offs, dtype=np.int64))


def test_matches_scalar_reference():
    xs, ys, offs = _rand_lines(1, 60)
    for eps in (0.05, 0.3, 1.0, 5.0):
        got = dp_keep_mask(xs, ys, offs, eps)
        for i in range(len(offs) - 1):
            a, b = offs[i], offs[i + 1]
            want = _dp_scalar(xs[a:b], ys[a:b], eps)
            assert (got[a:b] == want).all(), (i, eps)


def test_deviation_guarantee():
    """Every dropped vertex lies within eps of its covering chord."""
    xs, ys, offs = _rand_lines(2, 40)
    eps = 0.4
    keep = dp_keep_mask(xs, ys, offs, eps)
    for i in range(len(offs) - 1):
        a, b = offs[i], offs[i + 1]
        kidx = np.flatnonzero(keep[a:b]) + a
        for j in range(a, b):
            if keep[j]:
                continue
            pos = np.searchsorted(kidx, j)
            s, e = kidx[pos - 1], kidx[pos]
            dx, dy = xs[e] - xs[s], ys[e] - ys[s]
            norm = np.hypot(dx, dy)
            d = (abs(dx * (ys[j] - ys[s]) - dy * (xs[j] - xs[s])) / norm
                 if norm > 0 else np.hypot(xs[j] - xs[s], ys[j] - ys[s]))
            assert d <= eps + 1e-12


def test_straight_line_collapses_and_endpoints_kept():
    xs = np.linspace(0, 10, 50)
    ys = np.zeros(50)
    offs = np.array([0, 50], dtype=np.int64)
    keep = dp_keep_mask(xs, ys, offs, 0.0)
    assert keep[0] and keep[-1] and keep.sum() == 2
    # eps below the bump height keeps the bump vertex
    ys2 = ys.copy()
    ys2[25] = 1.0
    keep2 = dp_keep_mask(xs, ys2, offs, 0.5)
    assert keep2[25]


def test_dataset_stage(ray_session):
    import ray.data as rd

    from hecatoncheir_ray.geometry.simplify import simplify_lines
    from hecatoncheir_ray.sources.derive import _lines_table

    t = _lines_table(np.arange(200, dtype=np.int64))
    out = simplify_lines(rd.from_arrow(t).repartition(4), eps=0.05) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    src = t.to_pandas().sort_values("id").reset_index(drop=True)
    assert (out["id"] == src["id"]).all()
    n_out = out["coords"].map(len).sum()
    n_src = src["coords"].map(len).sum()
    assert n_out < n_src                      # something simplified
    for k in range(len(out)):
        oc, sc = out["coords"][k], src["coords"][k]
        assert oc[0] == sc[0] and oc[1] == sc[1]      # first vertex
        assert oc[-2] == sc[-2] and oc[-1] == sc[-1]  # last vertex
        assert out["minx"][k] >= src["minx"][k] - 1e-12
        assert out["maxx"][k] <= src["maxx"][k] + 1e-12
    # batch invariance
    out1 = simplify_lines(rd.from_arrow(t).repartition(1), eps=0.05) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert all(np.array_equal(a, b)
               for a, b in zip(out["coords"], out1["coords"]))
