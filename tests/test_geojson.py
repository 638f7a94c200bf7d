"""GeoJSON source/sink (sources/readers.py): load, distributed
GeoJSON-Lines read, roundtrip, and join parity with the WKT loader."""

import json
import os

import numpy as np
import pytest

from hecatoncheir_ray.sources.readers import (load_geojson_table,
                                              load_wkt_table, read_geojsonl,
                                              write_geojsonl)


@pytest.fixture()
def gj_file(tmp_path):
    feats = [
        {"type": "Feature", "id": 0, "properties": {},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]}},
        {"type": "Feature", "id": 1, "properties": {},
         "geometry": {"type": "Point", "coordinates": [1.5, 1.5]}},
        {"type": "Feature", "id": 2, "properties": {},
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 5], [2, 6], [4, 5]]}},
        # CW ring -> must be normalized to CCW
        {"type": "Feature", "id": 3, "properties": {},
         "geometry": {"type": "Polygon", "coordinates":
                      [[[10, 0], [10, 2], [12, 2], [12, 0], [10, 0]]]}},
        # MultiPolygon skipped like WKT MULTI* rows
        {"type": "Feature", "id": 4, "properties": {},
         "geometry": {"type": "MultiPolygon", "coordinates": []}},
    ]
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection",
                             "features": feats}))
    return str(p)


def test_load_geojson_table(gj_file):
    t = load_geojson_table(gj_file)
    assert t["id"].to_pylist() == [0, 1, 2, 3]
    assert t["gtype"].to_pylist() == [3, 1, 2, 3]
    # unclosed rings, CCW normalized
    sq = np.asarray(t["coords"][0].as_py()).reshape(-1, 2)
    assert sq.shape == (4, 2)
    cw = np.asarray(t["coords"][3].as_py()).reshape(-1, 2)
    x, y = cw[:, 0], cw[:, 1]
    assert np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) > 0
    # type filter
    only_poly = load_geojson_table(gj_file, "POLYGON")
    assert only_poly["id"].to_pylist() == [0, 3]
    # MBRs
    assert t["maxx"].to_pylist()[0] == 4.0


def test_geojsonl_roundtrip_and_wkt_parity(tmp_path, gj_file):
    t = load_geojson_table(gj_file)
    out = tmp_path / "rt.geojsonl"
    write_geojsonl(t, str(out))
    # driver-side reparse line-by-line equals the original table
    lines = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert [ln["id"] for ln in lines] == [0, 1, 2, 3]
    # WKT parity: same geometries through the WKT loader
    wkt = tmp_path / "layer.wkt"
    with open(wkt, "w") as f:
        f.write("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))\n")
        f.write("POINT (1.5 1.5)\n")
        f.write("LINESTRING (0 5, 2 6, 4 5)\n")
        f.write("POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))\n")
    w = load_wkt_table(str(wkt))
    for col in ("gtype", "minx", "miny", "maxx", "maxy"):
        assert t[col].to_pylist() == w[col].to_pylist()
    for k in range(4):
        a = np.asarray(t["coords"][k].as_py()).reshape(-1, 2)
        b = np.asarray(w["coords"][k].as_py()).reshape(-1, 2)
        # ring starts may differ by rotation (CW input reversed to CCW);
        # cyclic equality is geometry equality for unclosed rings
        assert any(np.array_equal(np.roll(a, r, axis=0), b)
                   for r in range(len(a))), k


def test_read_geojsonl_distributed(ray_session, tmp_path, gj_file):
    t = load_geojson_table(gj_file)
    f1 = tmp_path / "a.geojsonl"
    write_geojsonl(t, str(f1))
    ds = read_geojsonl(str(f1))
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 4
    assert got["gtype"].tolist() == [3, 1, 2, 3]
    # two files: ids are collision-free per file rank
    f2 = tmp_path / "b.geojsonl"
    write_geojsonl(t, str(f2))
    both = read_geojsonl([str(f1), str(f2)]).to_pandas()
    assert len(both) == 8
    assert len(set(both["id"])) == 8
