"""Image table synthesis, PNG codec, decode/verify/resize/patch stages,
geotags and tiling."""

import numpy as np
import pyarrow as pa
import pytest

from hecatoncheir_ray.config import GridSpec
from hecatoncheir_ray.sources.images import (DecodeImages, JpegNotSupported,
                                             PatchImages, ResizeImages,
                                             ahash64, geotag_table,
                                             make_verify_fn, png_decode,
                                             png_encode, psnr,
                                             ray_image_table,
                                             synth_image_rows, synth_pixels)


def test_png_roundtrip():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    buf = png_encode(px)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    back = png_decode(buf)
    np.testing.assert_array_equal(px, back)
    assert psnr(px, back) == float("inf")


def test_png_decode_filters():
    """Decoder handles filters 1-4 (foreign encoders use them)."""
    px = np.arange(24 * 24 * 3, dtype=np.uint8).reshape(24, 24, 3)
    import struct
    import zlib
    h, w, _ = px.shape
    bpp = 3
    lines = []
    for y in range(h):
        f = [1, 2, 3, 4][y % 4]
        cur = px[y].reshape(-1).astype(np.int32)
        prev = px[y - 1].reshape(-1).astype(np.int32) if y else \
            np.zeros(w * 3, np.int32)
        enc = np.zeros(w * 3, dtype=np.uint8)
        for x in range(w * 3):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + enc.tobytes())
    from hecatoncheir_ray.sources.images import _PNG_SIG, _chunk
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (_PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + _chunk(b"IEND", b""))
    np.testing.assert_array_equal(png_decode(buf), px)


def test_synth_rows_deterministic():
    t1 = synth_image_rows(np.array([5, 17, 99]))
    t2a = synth_image_rows(np.array([17]))
    r1 = t1.to_pylist()[1]
    r2 = t2a.to_pylist()[0]
    assert r1["bytes"] == r2["bytes"]
    assert r1["caption"] == r2["caption"] and r1["phash"] == r2["phash"]
    assert r1["image_id"] == "img00000017"
    # schema matches input_hint exactly
    assert [f.name for f in t1.schema] == ["image_id", "bytes", "w", "h",
                                           "fmt", "caption", "phash"]
    # phash consistent with pixels
    px = png_decode(r1["bytes"])
    assert ahash64(px) == r1["phash"]


def test_ray_image_pipeline(ray_session):
    ds = ray_image_table(64, seed=42)
    decoded = ds.map_batches(DecodeImages, batch_format="pyarrow",
                             batch_size=16, concurrency=2)
    rows = decoded.take_all()
    assert len(rows) == 64
    assert all(len(r["pixels"]) == r["w"] * r["h"] * 3 for r in rows)
    # per-row invariant: PSNR>=40 + caption equality (input_hint)
    ver = ray_image_table(64, seed=42).map_batches(
        make_verify_fn(42), batch_format="pyarrow", batch_size=16)
    vr = ver.take_all()
    assert all(r["psnr_ok"] and r["caption_ok"] for r in vr)
    assert all(r["psnr_db"] >= 40 for r in vr)


def test_jpeg_roundtrip_psnr():
    """Baseline JPEG (pure-numpy codec): real lossy compression with the
    input_hint invariant PSNR >= 40 dB, including non-multiple-of-8 dims
    (edge-replicated block padding)."""
    from hecatoncheir_ray.sources.images import psnr, synth_pixels
    from hecatoncheir_ray.sources.jpeg import jpeg_decode, jpeg_encode
    for idx, (w, h) in [(3, (32, 32)), (7, (48, 64)), (11, (40, 24)),
                        (13, (33, 51))]:
        px = synth_pixels(idx, 42, w, h)
        buf = jpeg_encode(px, 98)
        out = jpeg_decode(buf)
        assert out.shape == px.shape
        p = psnr(out, px)
        assert 40.0 <= p < 60.0          # lossy, not a disguised copy
        assert len(buf) < px.nbytes      # actually compressed


def test_jpeg_rows_and_decode_stage():
    """fmt='jpeg' / 'mixed' synthesis produces decodable rows; the
    DecodeImages actor stage dispatches per row; unknown fmt raises."""
    from hecatoncheir_ray.sources.images import ImageFormatNotSupported
    t = synth_image_rows(np.arange(6), fmt="mixed")
    fmts = set(t["fmt"].to_pylist())
    assert fmts <= {"png", "jpeg"} and len(fmts) == 2
    out = DecodeImages()(t)
    assert len(out) == 6
    assert out["w"].to_pylist() == t["w"].to_pylist()
    bad = t.set_column(4, "fmt", pa.array(["webp"] * 6))
    with pytest.raises(ImageFormatNotSupported):
        DecodeImages()(bad)
    assert len(DecodeImages(skip_undecodable=True)(bad)) == 0


def test_jpeg_verify_invariant(ray_session):
    """make_verify_fn over an all-jpeg table: every row >= 40 dB with
    caption equality — the lossy half of the input_hint invariant."""
    from hecatoncheir_ray.sources.images import (make_verify_fn,
                                                 ray_image_table)
    vr = ray_image_table(40, seed=42, fmt="jpeg") \
        .map_batches(make_verify_fn(42), batch_format="pyarrow",
                     batch_size=16).take_all()
    assert len(vr) == 40
    assert all(r["psnr_ok"] and r["caption_ok"] for r in vr)
    assert all(40.0 <= r["psnr_db"] < 99.0 for r in vr)  # finite => lossy


def test_resize_and_patch():
    t = synth_image_rows(np.array([3, 4]))
    small = ResizeImages(16, 16)(t)
    assert small["w"].to_pylist() == [16, 16]
    px = png_decode(small["bytes"][0].as_py())
    assert px.shape == (16, 16, 3)
    patches = PatchImages(grid=2)(t)
    assert len(patches) == 8      # 2 images x 2x2
    r0 = t.to_pylist()[0]
    got = [p for p in patches.to_pylist() if p["image_id"] == r0["image_id"]]
    assert sum(p["w"] for p in got if p["patch_y"] == 0) == r0["w"]


def test_geotag_and_tiling(ray_session):
    import ray.data as rd
    from hecatoncheir_ray.pipelines.tiling import (image_tile_assignments,
                                                   tile_assignments,
                                                   tile_counts, tile_cover)
    t = synth_image_rows(np.arange(50))
    g = geotag_table(t)
    assert len(g) == 50
    grid = GridSpec(-125.3, 24.0, -66.4, 49.9, ppd=16)
    ds = rd.from_arrow(g)
    asn = tile_assignments(ds, grid).take_all()
    assert len(asn) == 50
    assert all(0 <= r["tile_id"] < 256 for r in asn)
    cnt = tile_counts(rd.from_arrow(
        pa.table({"id": pa.array(np.arange(50, dtype=np.int64)),
                  "tile_id": pa.array([r["tile_id"] for r in asn],
                                      pa.int64())})), grid)
    assert cnt["n"].sum() == 50
    # image-level assignment matches geotag assignment
    ia = image_tile_assignments(rd.from_arrow(t), grid).take_all()
    by_idx = {int(r["image_id"][3:]): r["tile_id"] for r in ia}
    for r, a in zip(g.to_pylist(), asn):
        assert by_idx[r["id"]] == a["tile_id"]
    # polygon tile cover: each polygon covers >=1 tile, count matches explode
    from hecatoncheir_ray.sources.synth import table_layer
    polys = table_layer("polygons", 20, seed=5, bounds=(-120, 30, -80, 45),
                        min_edge=1.0, max_edge=5.0, min_v=4, max_v=8)
    cov = tile_cover(rd.from_arrow(polys), grid).take_all()
    assert len(cov) >= 20


def test_audio_video_stubs():
    """Compressed audio + video stay stubbed; corrupt wav raises unless
    skipped (wav itself is real now — see test_audio.py)."""
    from hecatoncheir_ray.sources.audio import DecodeAudio
    from hecatoncheir_ray.sources.images import (AudioNotSupported,
                                                 VideoNotSupported)
    from hecatoncheir_ray.sources.video import SampleVideoFrames
    mp3 = pa.table({"media_id": pa.array(["m1"]),
                    "bytes": pa.array([b"\x00\x01"], pa.binary()),
                    "fmt": pa.array(["mp3"])})
    with pytest.raises(AudioNotSupported):
        DecodeAudio()(mp3)
    assert len(DecodeAudio(skip_undecodable=True)(mp3)) == 0
    junk_wav = pa.table({"media_id": pa.array(["m2"]),
                         "bytes": pa.array([b"\x00\x01"], pa.binary()),
                         "fmt": pa.array(["wav"])})
    with pytest.raises(Exception):
        DecodeAudio()(junk_wav)
    assert len(DecodeAudio(skip_undecodable=True)(junk_wav)) == 0
    vid = pa.table({"media_id": pa.array(["m3"]),
                    "bytes": pa.array([b"\x00\x01"], pa.binary()),
                    "fmt": pa.array(["mkv"])})
    with pytest.raises(VideoNotSupported):
        SampleVideoFrames()(vid)
    assert len(SampleVideoFrames(skip_undecodable=True)(vid)) == 0


def test_seeded_near_dup_images_and_phash_pairs(ray_session):
    """dup_rate seeds visually-near rows: banded hamming LSH must equal
    the brute-force popcount pair set AND surface the seeded dups."""
    import ray.data as rd
    import numpy as np
    from hecatoncheir_ray.functions.dedup import (hamming64,
                                                  hamming_near_dup_pairs)
    from hecatoncheir_ray.sources.images import synth_image_rows

    t = synth_image_rows(np.arange(200, dtype=np.int64), seed=7,
                         dup_rate=0.2)
    ids = np.array([int(s[3:]) for s in t["image_id"].to_pylist()],
                   dtype=np.int64)
    hs = t["phash"].to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)
    kv = rd.from_arrow(__import__("pyarrow").table(
        {"doc_id": ids, "phash": hs.view(np.int64)})).repartition(8)
    got = hamming_near_dup_pairs(kv, "doc_id", "phash",
                                 max_hamming=6, num_bands=8)
    iu, ju = np.triu_indices(len(ids), 1)
    hit = hamming64(hs[iu], hs[ju]) <= 6
    want = sorted(zip(ids[iu[hit]].tolist(), ids[ju[hit]].tolist()))
    assert sorted(zip(got["doc_id_a"], got["doc_id_b"])) == want
    assert len(want) > 0          # seeded dups actually collide
    # wider guarantee: 16 bands must produce the same (exact) set
    got16 = hamming_near_dup_pairs(kv, "doc_id", "phash",
                                   max_hamming=6, num_bands=16)
    assert sorted(zip(got16["doc_id_a"], got16["doc_id_b"])) == want


def test_dup_rate_zero_table_unchanged():
    """dup_rate=0 must be byte-identical to the pre-dup synthesis (the
    verify invariant and every recorded oracle depend on it)."""
    import numpy as np
    from hecatoncheir_ray.sources.images import synth_image_rows
    a = synth_image_rows(np.arange(40, dtype=np.int64), seed=42)
    b = synth_image_rows(np.arange(40, dtype=np.int64), seed=42,
                         dup_rate=0.0)
    assert a.equals(b)


def test_perceptual_hash_dedup_separation(ray_session):
    """decode -> sampled-difference fingerprint -> banded LSH: every
    seeded (original, dup) pair found; unrelated pairs stay far."""
    import numpy as np
    import ray.data as rd
    from hecatoncheir_ray.functions.dedup import (hamming64,
                                                  hamming_near_dup_pairs)
    from hecatoncheir_ray.sources.images import (PerceptualHashImages,
                                                 dup_sources,
                                                 ray_image_table)
    kv = ray_image_table(200, seed=7, dup_rate=0.2) \
        .map_batches(PerceptualHashImages, batch_format="pyarrow",
                     batch_size=64, concurrency=2).materialize()
    got = hamming_near_dup_pairs(kv, "doc_id", "dhash",
                                 max_hamming=6, num_bands=8)
    have = set(zip(got["doc_id_a"], got["doc_id_b"]))
    isdup, src = dup_sources(np.arange(200, dtype=np.int64), 7, 0.2)
    seeded = {(min(int(s), int(i)), max(int(s), int(i)))
              for i, s in zip(np.nonzero(isdup)[0], src[isdup])}
    assert len(seeded) > 10 and seeded <= have
    # unrelated pairs stay far: the non-seeded remainder is tiny
    # (only dup-sibling pairs sharing one original may legitimately add)
    df = kv.to_pandas()
    hs = df["dhash"].to_numpy().astype(np.int64).view(np.uint64)
    iu, ju = np.triu_indices(len(hs), 1)
    h = hamming64(hs[iu], hs[ju])
    assert np.median(h) > 20


def test_dup_sources_chain_resolution():
    """src is always a rendered ORIGINAL (never itself a dup), and
    depends only on (seed, id) — batch-invariant."""
    import numpy as np
    from hecatoncheir_ray.sources.images import dup_sources
    from hecatoncheir_ray.sources.synth import rand01
    ids = np.arange(5000, dtype=np.int64)
    isdup, src = dup_sources(ids, 42, 0.3)
    still = (rand01(src, 42, 40) < 0.3) & (src > 0)
    assert not still.any()
    assert (src[~isdup] == ids[~isdup]).all()
    assert (src[isdup] < ids[isdup]).all()
    # split invariance
    _, s1 = dup_sources(ids[:1234], 42, 0.3)
    assert (s1 == src[:1234]).all()
