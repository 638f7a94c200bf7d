"""Scalar geometry measures (geometry/measures.py)."""

import numpy as np
import pyarrow as pa

from hecatoncheir_ray.geometry.measures import geometry_measures
from hecatoncheir_ray.sources.synth import (synth_linestrings, synth_points,
                                            synth_polygons)


def _measure(table):
    return geometry_measures(table).to_pylist()


def test_box_and_point_measures():
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "gtype": pa.array(np.array([4, 1], np.int8)),
        "coords": pa.array([[0.0, 0.0, 2.0, 3.0], [5.0, 7.0]],
                           pa.list_(pa.float64())),
        "minx": pa.array([0.0, 5.0]), "miny": pa.array([0.0, 7.0]),
        "maxx": pa.array([2.0, 5.0]), "maxy": pa.array([3.0, 7.0])})
    r = _measure(t)
    assert r[0]["area"] == 6.0 and r[0]["length"] == 10.0
    assert (r[0]["cx"], r[0]["cy"]) == (1.0, 1.5)
    assert r[1]["area"] == 0.0 and (r[1]["cx"], r[1]["cy"]) == (5.0, 7.0)


def test_polygon_measures_vs_shoelace_reference():
    ids = np.arange(40, dtype=np.int64)
    t = synth_polygons(ids, seed=5, min_v=5, max_v=24)
    out = _measure(t)
    coords = t["coords"]
    for k, row in enumerate(out):
        v = np.asarray(coords[k].as_py()).reshape(-1, 2)
        x, y = v[:, 0], v[:, 1]
        a = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        per = np.sum(np.hypot(np.roll(x, -1) - x, np.roll(y, -1) - y))
        assert abs(row["area"] - a) < 1e-9 * max(1, abs(a))
        assert abs(row["length"] - per) < 1e-9 * per
        assert row["area"] > 0          # CCW rings
        # centroid inside the MBR
        assert t["minx"][k].as_py() <= row["cx"] <= t["maxx"][k].as_py()


def test_linestring_measures():
    ids = np.arange(20, dtype=np.int64)
    t = synth_linestrings(ids, seed=6, min_v=2, max_v=8)
    out = _measure(t)
    coords = t["coords"]
    for k, row in enumerate(out):
        v = np.asarray(coords[k].as_py()).reshape(-1, 2)
        L = np.sum(np.hypot(np.diff(v[:, 0]), np.diff(v[:, 1])))
        assert row["area"] == 0.0
        assert abs(row["length"] - L) < 1e-9 * max(L, 1e-12)


def test_mixed_batch():
    ids = np.arange(10, dtype=np.int64)
    a = synth_points(ids, seed=1)
    b = synth_polygons(ids + 100, seed=2)
    t = pa.concat_tables([a, b])
    out = geometry_measures(t)
    assert len(out) == 20
    assert out["area"].to_numpy()[:10].sum() == 0.0
    assert (out["area"].to_numpy()[10:] > 0).all()
