"""WKB parquet source/sink (sources/readers.py): vectorized point fast
path vs per-row fallback, roundtrip, endianness/invalid-row handling,
distributed read, and spatial-join parity with the WKT-loaded inputs."""

import struct

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from hecatoncheir_ray import EngineConfig, spatial_join
from hecatoncheir_ray.geometry.core import GT_POINT, GT_POLYGON, to_wkb
from hecatoncheir_ray.sources.readers import (geom_to_wkb_table,
                                              load_wkt_table,
                                              parse_wkb_batch,
                                              read_wkb_parquet,
                                              write_wkb_parquet)

WKT_LINES = [
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POINT (1.5 1.5)",
    "LINESTRING (0 5, 2 6, 4 5)",
    "POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))",
    "POINT (3 3)",
]


@pytest.fixture()
def wkt_table(tmp_path):
    p = tmp_path / "layer.wkt"
    p.write_text("\n".join(WKT_LINES) + "\n")
    return load_wkt_table(str(p))


def test_wkb_batch_roundtrip(wkt_table):
    back = parse_wkb_batch(geom_to_wkb_table(wkt_table))
    for col in ("id", "gtype", "minx", "miny", "maxx", "maxy"):
        assert back[col].to_pylist() == wkt_table[col].to_pylist(), col
    for k in range(wkt_table.num_rows):
        assert back["coords"][k].as_py() == wkt_table["coords"][k].as_py()


def test_point_fast_path_equals_fallback():
    rng = np.random.default_rng(7)
    xy = rng.random((257, 2)) * 100
    bufs = [to_wkb(GT_POINT, p) for p in xy]
    ids = np.arange(257, dtype=np.int64)
    fast = parse_wkb_batch(pa.table({
        "id": pa.array(ids), "geometry": pa.array(bufs, type=pa.binary())}))
    # appending a polygon row breaks the all-21-byte precondition -> the
    # same points go through the per-row from_wkb path
    poly = to_wkb(GT_POLYGON, np.array([0, 0, 9, 0, 9, 9], dtype=float))
    slow = parse_wkb_batch(pa.table({
        "id": pa.array(np.append(ids, 999)),
        "geometry": pa.array(bufs + [poly], type=pa.binary())}))
    assert fast.num_rows == 257 and slow.num_rows == 258
    assert fast["gtype"].to_pylist() == [GT_POINT] * 257
    head = slow.slice(0, 257)
    for col in fast.column_names:
        assert fast[col].to_pylist() == head[col].to_pylist(), col
    # large_binary column takes the same fast path (int64 offsets)
    large = parse_wkb_batch(pa.table({
        "id": pa.array(ids),
        "geometry": pa.array(bufs, type=pa.large_binary())}))
    for col in fast.column_names:
        assert large[col].to_pylist() == fast[col].to_pylist(), col


def test_big_endian_nulls_and_garbage_rows():
    be_point = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 5.0, 7.0)
    t = pa.table({
        "id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "geometry": pa.array(
            [be_point, None, b"\x01\x02", to_wkb(GT_POINT, np.array([1., 2.]))],
            type=pa.binary()),
    })
    got = parse_wkb_batch(t)
    assert got["id"].to_pylist() == [10, 13]
    assert got["coords"][0].as_py() == [5.0, 7.0]


def test_data_type_filter_both_paths(wkt_table):
    wkb = geom_to_wkb_table(wkt_table)
    only_poly = parse_wkb_batch(wkb, want=GT_POLYGON)
    assert only_poly["id"].to_pylist() == [0, 3]
    # all-point batch + non-point filter exercises the fast-path reject
    pts = pa.table({"id": pa.array([0, 1], type=pa.int64()),
                    "geometry": pa.array(
                        [to_wkb(GT_POINT, np.array([1., 1.])),
                         to_wkb(GT_POINT, np.array([2., 2.]))],
                        type=pa.binary())})
    assert parse_wkb_batch(pts, want=GT_POLYGON).num_rows == 0
    assert parse_wkb_batch(pts, want=GT_POINT).num_rows == 2


def test_distributed_roundtrip_and_join_parity(ray_session, tmp_path,
                                               wkt_table):
    out = str(tmp_path / "wkb_parquet")
    write_wkb_parquet(rd.from_arrow(wkt_table), out)
    got = read_wkb_parquet(out).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert got["id"].tolist() == wkt_table["id"].to_pylist()
    assert got["gtype"].tolist() == wkt_table["gtype"].to_pylist()
    for col in ("minx", "miny", "maxx", "maxy"):
        assert got[col].tolist() == wkt_table[col].to_pylist(), col
    # declared-type filter at the distributed reader
    polys = read_wkb_parquet(out, data_type="POLYGON").to_pandas()
    assert sorted(polys["id"].tolist()) == [0, 3]
    # join over WKB-read inputs == join over the WKT-loaded originals
    cfg = EngineConfig(ppd=8)
    r_wkb = read_wkb_parquet(out, data_type="POLYGON")
    s_wkb = read_wkb_parquet(out, data_type="POINT")
    pairs_wkb = spatial_join(r_wkb, s_wkb, "intersects", cfg).to_pandas()
    r = rd.from_arrow(wkt_table.filter(
        pa.compute.equal(wkt_table["gtype"], GT_POLYGON)))
    s = rd.from_arrow(wkt_table.filter(
        pa.compute.equal(wkt_table["gtype"], GT_POINT)))
    pairs_wkt = spatial_join(r, s, "intersects", EngineConfig(ppd=8)) \
        .to_pandas()
    key = ["r_id", "s_id"]
    assert sorted(map(tuple, pairs_wkb[key].values.tolist())) == \
        sorted(map(tuple, pairs_wkt[key].values.tolist()))
    assert len(pairs_wkt) > 0


# --- property tests (hypothesis): codec + batch parser ----------------------

from hypothesis import given, settings, strategies as st

from hecatoncheir_ray.geometry.core import (GT_BOX, GT_LINESTRING, from_wkb,
                                            mbr_of)

_coord = st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                   allow_infinity=False, width=64).map(
                       lambda v: round(v, 4))


@st.composite
def _geoms(draw):
    gt = draw(st.sampled_from([GT_POINT, GT_LINESTRING, GT_POLYGON, GT_BOX]))
    if gt == GT_POINT:
        return gt, np.array([draw(_coord), draw(_coord)])
    if gt == GT_BOX:
        x0, x1 = sorted((draw(_coord), draw(_coord)))
        y0, y1 = sorted((draw(_coord), draw(_coord)))
        return gt, np.array([x0, y0, x1 + 1e-3, y1 + 1e-3])
    if gt == GT_LINESTRING:
        n = draw(st.integers(2, 12))
        return gt, np.array([draw(_coord) for _ in range(2 * n)])
    # polygon: CCW ring of well-separated circle points (never degenerate:
    # angle gaps >= 0.6*(2pi/n) keep every vertex distinct, and no three
    # points of a circle are collinear, so correct_ring is the identity)
    cx, cy = draw(_coord), draw(_coord)
    n = draw(st.integers(3, 10))
    jit = np.array([draw(st.floats(0, 0.4, allow_nan=False))
                    for _ in range(n)])
    ang = (np.arange(n) + jit) * (2 * np.pi / n)
    r = draw(st.floats(0.01, 50, allow_nan=False))
    pts = np.c_[cx + r * np.cos(ang), cy + r * np.sin(ang)]
    return GT_POLYGON, pts.ravel()


@settings(max_examples=150, deadline=None)
@given(_geoms())
def test_wkb_codec_roundtrip_property(g):
    """to_wkb -> from_wkb preserves geometry (boxes come back as their
    polygon ring) and the MBR is invariant under the roundtrip."""
    gt, coords = g
    back = from_wkb(to_wkb(gt, coords))
    assert back is not None
    bt, bc = back
    if gt == GT_BOX:
        assert bt == GT_POLYGON and len(bc) == 8
    else:
        assert bt == gt
        np.testing.assert_array_equal(np.asarray(bc).ravel(), coords)
    np.testing.assert_allclose(mbr_of(bt, np.asarray(bc)),
                               mbr_of(gt, coords), rtol=0, atol=1e-12)


@settings(max_examples=50, deadline=None)
@given(st.lists(_geoms(), min_size=0, max_size=20))
def test_parse_wkb_batch_property(gs):
    """Batch parse of arbitrary geometry mixes == per-geometry from_wkb
    (ids aligned, skipped rows only where from_wkb skips)."""
    bufs = [to_wkb(gt, c) for gt, c in gs]
    t = pa.table({"id": pa.array(np.arange(len(bufs), dtype=np.int64)),
                  "geometry": pa.array(bufs, type=pa.binary())})
    got = parse_wkb_batch(t)
    assert got["id"].to_pylist() == list(range(len(bufs)))
    for k, buf in enumerate(bufs):
        gt, coords = from_wkb(buf)
        assert got["gtype"][k].as_py() == gt
        np.testing.assert_array_equal(
            np.asarray(got["coords"][k].as_py()), np.asarray(coords).ravel())


def test_malformed_wkb_rows_skip_not_raise():
    """Truncated buffers, overrunning vertex counts, empty geometries and
    degenerate rings are skipped (parse_wkt's skip-don't-raise policy)."""
    good = to_wkb(GT_POINT, np.array([1.0, 2.0]))
    bad = [
        b"\x01" + struct.pack("<I", 1) + b"\x00" * 8,        # truncated point
        b"\x01" + struct.pack("<II", 2, 2**31 - 1),           # count overrun
        b"\x01" + struct.pack("<II", 2, 0),                   # empty line
        b"\x01" + struct.pack("<III", 3, 1, 0),               # empty ring
        b"\x01" + struct.pack("<III", 3, 1, 4)                # degenerate ring
        + np.zeros(8).tobytes(),
        b"\x01" + struct.pack("<II", 2, 1) + np.ones(2).tobytes(),  # 1-pt line
    ]
    for buf in bad:
        assert from_wkb(buf) is None, buf
    t = pa.table({"id": pa.array(np.arange(len(bad) + 1, dtype=np.int64)),
                  "geometry": pa.array(bad + [good], type=pa.binary())})
    got = parse_wkb_batch(t)
    assert got["id"].to_pylist() == [len(bad)]


def test_null_id_raises_and_box_filter_rejected(tmp_path, ray_session):
    t = pa.table({"id": pa.array([1, None], type=pa.int64()),
                  "geometry": pa.array(
                      [to_wkb(GT_POINT, np.array([0., 0.]))] * 2,
                      type=pa.binary())})
    with pytest.raises(ValueError, match="nulls"):
        parse_wkb_batch(t)
    with pytest.raises(ValueError, match="POLYGON"):
        read_wkb_parquet(str(tmp_path), data_type="BOX")


def test_wkb_driver_query_scratch_dir_reused(ray_session):
    """Repeated poly_join_pairs_wkb invocations reuse ONE deterministic
    scratch dir (no /tmp accumulation, no doubled parquet fragments)."""
    import glob
    import hashlib
    import sys
    import tempfile
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry
    sf = "/root/testdata/sf0.001"
    tag = hashlib.sha1(sf.encode()).hexdigest()[:12]
    scratch = f"{tempfile.gettempdir()}/hec_wkb_q_{tag}"
    n1 = entry.queries()["poly_join_pairs_wkb"](sf).count()
    files1 = sorted(glob.glob(f"{scratch}/*/*.parquet"))
    n2 = entry.queries()["poly_join_pairs_wkb"](sf).count()
    files2 = sorted(glob.glob(f"{scratch}/*/*.parquet"))
    assert n1 == n2 > 0
    assert len(files1) == len(files2) > 0
