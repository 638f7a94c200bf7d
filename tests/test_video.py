"""HECV video container + frame-sampling stages (sources/video.py)."""

import numpy as np
import pyarrow as pa
import pytest

from hecatoncheir_ray.sources.video import (SampleVideoFrames,
                                            VideoFeatures, hecv_decode_frame,
                                            hecv_encode, hecv_header,
                                            make_video_verify_fn,
                                            ray_video_table, synth_frame,
                                            synth_video_rows)


def test_hecv_roundtrip_bit_exact():
    frames = [synth_frame(7, f, 42, 32, 24) for f in range(5)]
    buf = hecv_encode(frames, fps=6)
    w, h, fps, nframes, offs, codec = hecv_header(buf)
    assert (w, h, fps, nframes, codec) == (32, 24, 6, 5, "png")
    assert offs[-1] == len(buf)
    for k, src in enumerate(frames):
        assert (hecv_decode_frame(buf, k) == src).all()


def test_hecvj_jpeg_frames_meet_psnr_floor():
    """v2 container with baseline-JPEG frames: deterministic encode,
    every frame seek-decodes to >= 40 dB vs its source (input_hint's
    lossy bar) and bit-equals the reference recode."""
    from hecatoncheir_ray.sources.images import JPEG_QUALITY, psnr
    from hecatoncheir_ray.sources.jpeg import jpeg_decode, jpeg_encode
    frames = [synth_frame(9, f, 42, 40, 32) for f in range(4)]
    buf = hecv_encode(frames, fps=5, codec="jpeg")
    assert hecv_encode(frames, fps=5, codec="jpeg") == buf  # determinism
    w, h, fps, nframes, offs, codec = hecv_header(buf)
    assert (w, h, fps, nframes, codec) == (40, 32, 5, 4, "jpeg")
    assert offs[-1] == len(buf)
    for k, src in enumerate(frames):
        px = hecv_decode_frame(buf, k)
        assert px.shape == src.shape
        assert psnr(px, src) >= 40.0
        assert (px == jpeg_decode(jpeg_encode(src, JPEG_QUALITY))).all()


def test_sample_stage_seeks_only_sampled_frames():
    t = synth_video_rows(np.array([3, 4], dtype=np.int64))
    out = SampleVideoFrames(every_n=4, reencode=True)(t)
    nfr = t["nframes"].to_pylist()
    expect = sum(len(range(0, n, 4)) for n in nfr)
    assert len(out) == expect
    assert out["frame_idx"].to_pylist()[0] == 0
    # each emitted blob is a standalone decodable PNG equal to the source
    for row in out.to_pylist():
        i = int(row["media_id"][3:])
        from hecatoncheir_ray.sources.images import png_decode
        px = png_decode(row["bytes"])
        assert (px == synth_frame(i, row["frame_idx"], 42,
                                  row["w"], row["h"])).all()
    # t_us uses the container fps
    fps = t["fps"].to_pylist()[0]
    r0 = [r for r in out.to_pylist() if r["media_id"].endswith("3")]
    assert r0[1]["t_us"] == 4 * 1_000_000 // fps


def test_video_features_and_verify():
    t = synth_video_rows(np.arange(6, dtype=np.int64))
    feats = VideoFeatures(every_n=2)(t)
    assert len(feats) == 6
    d = feats.to_pylist()
    nfr = t["nframes"].to_pylist()
    fps = t["fps"].to_pylist()
    assert all(abs(r["duration_s"] - n / f) < 1e-12
               for r, n, f in zip(d, nfr, fps))
    assert all(0 < r["mean_luma"] < 255 for r in d)
    assert all(r["mean_delta"] > 0 for r in d)   # frames animate
    v = make_video_verify_fn(42, every_n=2)(t)
    assert all(v["frames_ok"].to_pylist())
    assert all(v["caption_ok"].to_pylist())


def test_verify_catches_tamper():
    t = synth_video_rows(np.array([11], dtype=np.int64))
    buf = bytearray(t["bytes"].to_pylist()[0])
    buf[-20] ^= 0xFF    # flip a bit inside the last frame's pixels
    t2 = t.set_column(1, "bytes", pa.array([bytes(buf)], pa.binary()))
    v = make_video_verify_fn(42, every_n=1)(t2)
    assert v["frames_ok"].to_pylist() == [False]


def test_compressed_fmt_raises_or_skips():
    from hecatoncheir_ray.sources.images import VideoNotSupported
    vid = pa.table({"media_id": pa.array(["m3"]),
                    "bytes": pa.array([b"\x00\x01"], pa.binary()),
                    "fmt": pa.array(["mp4"])})
    with pytest.raises(VideoNotSupported):
        SampleVideoFrames()(vid)
    assert len(SampleVideoFrames(skip_undecodable=True)(vid)) == 0
    with pytest.raises(VideoNotSupported):
        VideoFeatures(skip_undecodable=False)(vid)


def test_ray_video_pipeline(ray_session):
    ds = ray_video_table(60, seed=42)
    bad = ds.map_batches(make_video_verify_fn(42), batch_format="pyarrow",
                         batch_size=32) \
        .filter(expr="frames_ok == False or caption_ok == False")
    assert bad.count() == 0
    frames = ds.map_batches(SampleVideoFrames, fn_constructor_kwargs={},
                            concurrency=2, batch_format="pyarrow",
                            batch_size=32)
    n = frames.count()
    assert n > 60          # >= 2 sampled frames per clip on average
    sch = frames.schema()
    assert sch.names == ["media_id", "frame_idx", "t_us", "bytes",
                         "codec", "w", "h"]


def test_mixed_codec_table_sample_features_verify(ray_session):
    """'mixed' table (PNG-frame hecv / JPEG-frame hecvj per-row hash
    choice) flows through sampling, features and the codec-aware verify;
    every row clears its codec's invariant (bit-exact recode vs the
    deterministic reference encoding + the JPEG PSNR >= 40 dB floor)."""
    t = synth_video_rows(np.arange(40, dtype=np.int64), fmts="mixed")
    fmts = set(t["fmt"].to_pylist())
    assert fmts == {"hecv", "hecvj"}
    out = SampleVideoFrames(every_n=3, reencode=True)(t)
    assert set(out["codec"].to_pylist()) == {"png", "jpeg"}
    feats = VideoFeatures(every_n=3)(t)
    assert len(feats) == 40
    ver = ray_video_table(100, seed=42, fmts="mixed").map_batches(
        make_video_verify_fn(42), batch_format="pyarrow", batch_size=32)
    rows = ver.take_all()
    assert len(rows) == 100
    assert all(r["frames_ok"] and r["caption_ok"] for r in rows)
    lossy = [r for r in rows if r["psnr_db"] < 99.0]
    assert lossy and all(r["psnr_db"] >= 40.0 for r in lossy)
    assert len(lossy) < 100    # the PNG half stays lossless


def test_verify_catches_codec_fmt_mismatch():
    """A row whose fmt tag says hecv but whose container is JPEG-coded
    must fail verify even if the pixels are close (metadata integrity
    is part of the invariant)."""
    t = synth_video_rows(np.array([5], dtype=np.int64), fmts="hecvj")
    t2 = t.set_column(6, "fmt", pa.array(["hecv"], pa.string()))
    v = make_video_verify_fn(42, every_n=1)(t2)
    assert v["frames_ok"].to_pylist() == [False]
