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


def _ring_scalar(xs, ys, eps):
    """Scalar reference for the closed-ring rule: anchor at v0 and the
    first farthest-from-v0 vertex, DP the two chains, min-3 fixup."""
    n = len(xs)
    if n <= 3:
        return np.ones(n, dtype=bool)
    d2 = (xs - xs[0]) ** 2 + (ys - ys[0]) ** 2
    far = max(int(np.argmax(d2)), 1)
    keep = np.zeros(n, dtype=bool)
    chainA = np.arange(0, far + 1)
    chainB = np.concatenate([np.arange(far, n), [0]])
    for ch in (chainA, chainB):
        k = _dp_scalar(xs[ch], ys[ch], eps)
        keep[ch[k]] = True
    if keep.sum() < 3:
        cand = [j for j in range(n) if j != 0 and j != far]
        dx, dy = xs[far] - xs[0], ys[far] - ys[0]
        norm = np.hypot(dx, dy)
        dd = [abs(dx * (ys[j] - ys[0]) - dy * (xs[j] - xs[0])) / norm
              if norm > 0 else np.hypot(xs[j] - xs[0], ys[j] - ys[0])
              for j in cand]
        keep[cand[int(np.argmax(dd))]] = True
    return keep


def test_ring_matches_scalar_reference():
    from hecatoncheir_ray.geometry.simplify import ring_keep_mask
    rng = np.random.RandomState(5)
    offs = [0]
    xs, ys = [], []
    for _ in range(50):
        m = rng.randint(4, 30)
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = rng.uniform(0.5, 2.0, m)
        xs.append(r * np.cos(ang))
        ys.append(r * np.sin(ang))
        offs.append(offs[-1] + m)
    xs, ys = np.concatenate(xs), np.concatenate(ys)
    offs = np.array(offs, dtype=np.int64)
    for eps in (0.01, 0.2, 1.0, 10.0):
        got = ring_keep_mask(xs, ys, offs, eps)
        for i in range(len(offs) - 1):
            a, b = offs[i], offs[i + 1]
            want = _ring_scalar(xs[a:b], ys[a:b], eps)
            assert (got[a:b] == want).all(), (i, eps)
            assert got[a:b].sum() >= 3        # always a valid ring


def test_simplify_polygons_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hecatoncheir_ray.geometry.simplify import simplify_polygons
    from hecatoncheir_ray.sources.derive import _octagons_table

    t = _octagons_table(np.arange(300, dtype=np.int64), 7)
    out = simplify_polygons(rd.from_arrow(t).repartition(4), eps=0.001) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    src = t.to_pandas().sort_values("id").reset_index(drop=True)
    nv_out = out["coords"].map(len).sum()
    nv_src = src["coords"].map(len).sum()
    assert nv_out <= nv_src
    assert all(len(c) >= 6 for c in out["coords"])    # >= 3 vertices
    # at tiny eps the octagons' shape survives: area within 1%
    from hecatoncheir_ray.geometry.measures import measures_dataset
    a_out = measures_dataset(
        rd.from_arrow(pa.Table.from_pandas(out))).to_pandas() \
        .sort_values("id")["area"].to_numpy()
    a_src = measures_dataset(rd.from_arrow(t)).to_pandas() \
        .sort_values("id")["area"].to_numpy()
    assert np.all(np.abs(a_out - a_src) <= 0.01 * a_src + 1e-12)
