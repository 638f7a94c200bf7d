"""Video table: real multi-frame codec — the video leg of SURVEY's
multimodal-column plan, upgraded from a stub (VERDICT r2 "what's missing"
item 4).  Mirrors the image/audio table design (sources/images.py,
sources/audio.py): opaque ``binary`` payload + typed metadata columns,
deterministic hash-seeded synthesis (batching-independent), actor-pool
frame-sampling / feature stages, and a per-row verify invariant (PNG
frames are lossless -> bit equality, plus caption equality).

Container: ``HECV`` — a minimal *seekable* uncompressed-index format:

    b"HECV" | ver:u8 | w:u16 | h:u16 | fps:u16 | nframes:u32
    | frame_len:u32 * nframes                # byte index => O(1) seek
    | frame bytes (PNG each, images.png_encode)

The per-frame byte index is the point: a frame-sampling stage reads the
header + index and decodes ONLY the sampled frames — decode cost scales
with frames *kept*, not frames *stored*, which is what makes sampling a
10^12-row video corpus tractable.  Compressed formats (mp4/webm/...)
remain behind :class:`~.images.VideoNotSupported` — no codec libraries
exist in this container; the Ray-side plumbing treats them identically.

Schema: (media_id:string, bytes:binary, w:int32, h:int32, fps:int32,
nframes:int32, fmt:string, caption:string).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .images import png_decode, png_encode, synth_pixels
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
_HDR = ">4sBHHHI"          # magic, ver, w, h, fps, nframes
_HDR_LEN = struct.calcsize(_HDR)

_SCENES = ["waves on a beach", "traffic at dusk", "a campfire",
           "snow falling", "a windmill turning", "leaves in the wind",
           "a passing cyclist", "clouds over hills"]


def hecv_encode(frames: list[np.ndarray], fps: int) -> bytes:
    """List of (h, w, 3) uint8 frames -> HECV bytes (PNG per frame)."""
    h, w, _ = frames[0].shape
    blobs = [png_encode(f) for f in frames]
    head = struct.pack(_HDR, _MAGIC, 1, w, h, fps, len(blobs))
    index = struct.pack(f">{len(blobs)}I", *[len(b) for b in blobs])
    return head + index + b"".join(blobs)


def hecv_header(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """-> (w, h, fps, nframes, byte offset of each frame) — no decode."""
    magic, ver, w, h, fps, nframes = struct.unpack_from(_HDR, data, 0)
    if magic != _MAGIC or ver != 1:
        raise ValueError("not a HECV container")
    lens = np.frombuffer(data, dtype=">u4", count=nframes,
                         offset=_HDR_LEN).astype(np.int64)
    offs = _HDR_LEN + 4 * nframes + np.concatenate(
        [[0], np.cumsum(lens)])
    return w, h, fps, nframes, offs


def hecv_decode_frame(data: bytes, k: int) -> np.ndarray:
    """Seek-decode frame k only (O(1) via the byte index)."""
    *_, nframes, offs = hecv_header(data)
    if not 0 <= k < nframes:
        raise IndexError(k)
    return png_decode(data[offs[k]:offs[k + 1]])


def synth_frame(idx: int, frame: int, seed: int, w: int,
                h: int) -> np.ndarray:
    """Deterministic frame ``frame`` of video ``idx``: the image-table
    pixel synth keyed on a (video, frame) composite id — any frame is
    re-synthesizable in isolation (verify never decodes the rest)."""
    return synth_pixels(int(idx) * 100_000 + frame, seed, w, h)


def synth_video_rows(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Deterministic video+caption rows (real HECV bytes) for the ids."""
    ids = np.asarray(ids, dtype=np.int64)
    ws = 24 + 8 * (rand01(ids, seed, 60) * 3).astype(int)      # 24/32/40
    hs = 24 + 8 * (rand01(ids, seed, 61) * 3).astype(int)
    fps = 5 + (rand01(ids, seed, 62) * 3).astype(int)          # 5..7
    nfr = 6 + (rand01(ids, seed, 63) * 10).astype(int)         # 6..15
    scn = (rand01(ids, seed, 64) * len(_SCENES)).astype(int)
    mids, blobs, caps = [], [], []
    for k, i in enumerate(ids.tolist()):
        frames = [synth_frame(i, f, seed, int(ws[k]), int(hs[k]))
                  for f in range(int(nfr[k]))]
        blobs.append(hecv_encode(frames, int(fps[k])))
        mids.append(f"vid{i:08d}")
        caps.append(f"A clip of {_SCENES[scn[k]]} (#{i}).")
    return pa.table({
        "media_id": pa.array(mids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws.astype(np.int32), pa.int32()),
        "h": pa.array(hs.astype(np.int32), pa.int32()),
        "fps": pa.array(fps.astype(np.int32), pa.int32()),
        "nframes": pa.array(nfr.astype(np.int32), pa.int32()),
        "fmt": pa.array(["hecv"] * len(ids), pa.string()),
        "caption": pa.array(caps, pa.string()),
    }, schema=VIDEO_SCHEMA)


def ray_video_table(n: int, seed: int = 42, parallelism: int = -1):
    """Distributed deterministic video table (row i independent of
    batching); small batches — multi-frame binary rows are wide."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return synth_video_rows(
            batch["id"].to_numpy(zero_copy_only=False), seed)

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0
                  else None)
    return ds.map_batches(build, batch_format="pyarrow", batch_size=128)


class SampleVideoFrames:
    """Actor-pool stage: every ``every_n``-th frame per video -> one row
    per sampled frame (media_id, frame_idx, t_us, bytes, w, h).

    Seeks via the HECV byte index: only sampled frames are ever PNG-
    decoded/re-emitted; skipped frames are never touched.  Compressed
    formats raise :class:`~.images.VideoNotSupported` unless
    ``skip_undecodable``."""

    def __init__(self, every_n: int = 4, skip_undecodable: bool = False,
                 reencode: bool = False):
        self.every_n = every_n
        self.skip = skip_undecodable
        self.reencode = reencode

    def __call__(self, t: pa.Table) -> pa.Table:
        from .images import VideoNotSupported
        mids, fidx, tus, blobs, ws, hs = [], [], [], [], [], []
        for mid, fmt, buf in zip(t["media_id"].to_pylist(),
                                 t["fmt"].to_pylist(),
                                 t["bytes"].to_pylist()):
            if fmt != "hecv":
                if self.skip:
                    continue
                raise VideoNotSupported(
                    f"{fmt!r} decode not available in this environment")
            w, h, fps, nframes, offs = hecv_header(buf)
            for f in range(0, nframes, self.every_n):
                frame_png = buf[offs[f]:offs[f + 1]]
                if self.reencode:   # decode+re-encode proves the codec
                    frame_png = png_encode(png_decode(frame_png))
                mids.append(mid)
                fidx.append(f)
                tus.append(f * 1_000_000 // fps)
                blobs.append(frame_png)
                ws.append(w)
                hs.append(h)
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "t_us": pa.array(tus, pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
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
            if fmt != "hecv":
                if self.skip:
                    continue
                raise VideoNotSupported(fmt)
            w, h, fps, nframes, offs = hecv_header(buf)
            fr = [png_decode(buf[offs[f]:offs[f + 1]]).astype(np.float64)
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


def make_video_verify_fn(seed: int = 42, every_n: int = 4):
    """Per-row invariant stage (input_hint pattern, lossless codec):
    every sampled frame decodes BIT-EQUAL to its re-synthesized source
    (PSNR = inf), caption matches."""

    def verify(t: pa.Table) -> pa.Table:
        ok_px, ok_cap = [], []
        for row in t.to_pylist():
            i = int(row["media_id"][3:])
            buf = row["bytes"]
            w, h, fps, nframes, offs = hecv_header(buf)
            ok = (w == row["w"] and h == row["h"]
                  and nframes == row["nframes"] and fps == row["fps"])
            for f in range(0, nframes, every_n):
                try:
                    px = png_decode(buf[offs[f]:offs[f + 1]])
                except Exception:     # truncated/corrupt frame
                    ok = False
                    break
                ref = synth_frame(i, f, seed, w, h)
                ok = ok and bool((px == ref).all())
            ok_px.append(ok)
            scn = (rand01(np.array([np.int64(i)]), seed, 64)
                   * len(_SCENES)).astype(int)[0]
            ok_cap.append(row["caption"]
                          == f"A clip of {_SCENES[scn]} (#{i}).")
        return pa.table({
            "media_id": t["media_id"],
            "frames_ok": pa.array(ok_px, pa.bool_()),
            "caption_ok": pa.array(ok_cap, pa.bool_()),
        })

    return verify
