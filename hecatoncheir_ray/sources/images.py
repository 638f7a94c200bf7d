"""Image+caption table (the graft input, BASELINE.json input_hint):

``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64)``

Synthesis is deterministic (hash-seeded per row, batching-independent) and
produces REAL image bytes via pure-Python codecs — PNG (zlib + struct,
all 5 scanline filters on decode) and baseline JPEG (:mod:`.jpeg`:
YCbCr + 8x8 DCT + Annex-K quantization/Huffman).  No image libraries
exist in this environment; both codecs are self-contained.

Per-row invariant vs the source (input_hint): decoded pixels allclose
(PSNR = inf for PNG; >= 40 dB required for lossy JPEG) + caption
equality — :func:`make_verify_fn` computes both per row.  The JPEG
family encodes at quality 98: genuinely lossy (DCT quantization error
is present) yet above the 40 dB bar (worst observed 43.6 dB on this
fixture).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .jpeg import jpeg_decode, jpeg_encode
from .synth import rand01

JPEG_QUALITY = 98

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


class ImageFormatNotSupported(NotImplementedError):
    """Unknown image format — png and baseline jpeg are implemented
    in-container (pure Python); anything else (webp/avif/...) raises
    this until a codec library exists on the cluster."""


# Backwards-compat alias (JPEG itself IS supported since round 4 via
# sources/jpeg.py; only non-png/jpeg formats raise now)
JpegNotSupported = ImageFormatNotSupported


class AudioNotSupported(NotImplementedError):
    """Compressed-audio decode stub (no codec libraries here).

    WAV/PCM16 is fully supported — see :mod:`.audio` (stdlib ``wave``);
    only mp3/aac/... raise this."""


class VideoNotSupported(NotImplementedError):
    """Compressed-video decode stub (no codec libraries here).

    The HECV multi-frame container is fully supported — see :mod:`.video`
    (seekable index + PNG frames); only mp4/webm/... raise this."""


# ---------------------------------------------------------------------------
# PNG codec (RGB8, pure python)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, filter 0)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports 8-bit RGB, filters 0-4."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, *_ = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3
    raw = raw.reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride,
                                                             np.int32)
        if f == 0:
            out[y] = line
        elif f == 2:      # up
            out[y] = (line + prev) & 0xFF
        elif f in (1, 3, 4):   # sub / average / paeth need a scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else \
                        (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"unknown filter {f}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# deterministic pixels / phash
# ---------------------------------------------------------------------------

_SIZES = np.array([32, 48, 64], dtype=np.int32)


def synth_pixels(idx: int, seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8: two-color gradient + hash noise."""
    i = np.int64(idx)
    c0 = np.array([rand01(np.array([i]), seed, 30 + k)[0] * 255
                   for k in range(3)])
    c1 = np.array([rand01(np.array([i]), seed, 33 + k)[0] * 255
                   for k in range(3)])
    gx = np.linspace(0, 1, w)[None, :, None]
    gy = np.linspace(0, 1, h)[:, None, None]
    ang = rand01(np.array([i]), seed, 36)[0]
    g = ang * gx + (1 - ang) * gy
    img = c0[None, None, :] * (1 - g) + c1[None, None, :] * g
    # deterministic noise from (idx, pixel index)
    pix_idx = (i * np.int64(1000003)
               + np.arange(h * w * 3, dtype=np.int64))
    noise = (rand01(pix_idx, seed, 37) - 0.5) * 24.0
    img = img + noise.reshape(h, w, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def dup_sources(ids: np.ndarray, seed: int,
                dup_rate: float) -> tuple[np.ndarray, np.ndarray]:
    """(isdup, src): which rows are near-duplicates and which ORIGINAL
    row each re-renders.  A dup's raw base ``floor(u01 * i)`` may itself
    be a dup; the chain is resolved hop by hop (each hop derives from
    (seed, current id) alone, so the result is batch-invariant) until
    src is a rendered original — dup pixels always match an actual row."""
    isdup = (rand01(ids, seed, 40) < dup_rate) & (ids > 0)
    src = np.where(isdup,
                   np.floor(rand01(ids, seed, 41) * ids).astype(np.int64),
                   ids)
    while True:
        again = (rand01(src, seed, 40) < dup_rate) & (src > 0) & isdup
        if not again.any():
            return isdup, src
        src = np.where(again,
                       np.floor(rand01(src, seed, 41)
                                * src).astype(np.int64), src)


def ahash64(pixels: np.ndarray) -> int:
    """Average-hash over an 8x8 block-mean downsample -> signed int64."""
    h, w, _ = pixels.shape
    gray = pixels.astype(np.float64).mean(axis=2)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.array([[gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                        for j in range(8)] for i in range(8)])
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def _dhash_sample_uv():
    """The 64 fixed relative sample positions (u, v) — module-level
    constants so the per-image hot loop never recomputes them."""
    from .synth import _splitmix64
    k = np.arange(64, dtype=np.uint64)
    u = (_splitmix64(k + np.uint64(101)) >> np.uint64(11)) / float(1 << 53)
    v = (_splitmix64(k + np.uint64(202)) >> np.uint64(11)) / float(1 << 53)
    return u, v


_DHASH_U, _DHASH_V = _dhash_sample_uv()
_DHASH_WEIGHTS = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def dhash64_sampled(pixels: np.ndarray) -> int:
    """Noise-sensitive perceptual hash: 64 adjacent-pixel comparisons at
    hash-fixed relative positions -> signed int64.

    Rationale: block-mean hashes (ahash64 above, classic dhash) collapse
    on low-rank content — this fixture's smooth two-color gradients live
    in a ~2-D block-mean subspace, so unrelated images collide heavily
    (measured ~1% of pairs at hamming 0).  Comparing ADJACENT pixels
    cancels the smooth component and keys the bit on the image's
    high-frequency detail, which is unique per image here; measured
    separation on the seeded-dup fixture: dup pairs <= 1 bit, unrelated
    median 32.  Positions are relative (u, v), so equal-size renders
    compare the same sample set."""
    h, w, _ = pixels.shape
    gray = pixels.astype(np.int32).sum(axis=2)
    xs = np.minimum((_DHASH_U * (w - 1)).astype(np.int64), w - 2)
    ys = np.minimum((_DHASH_V * h).astype(np.int64), h - 1)
    bits = (gray[ys, xs] > gray[ys, xs + 1]).astype(np.uint64)
    # dot with descending bit weights == the former shift-or loop
    val = np.bitwise_or.reduce(bits * _DHASH_WEIGHTS)
    return int(val.astype(np.int64))


class PerceptualHashImages:
    """Actor-pool stage: (image_id, bytes, fmt) -> (doc_id, dhash).

    The decode -> fingerprint front half of an image-dedup pipeline
    (pair discovery is ``functions.dedup.hamming_near_dup_pairs`` on the
    output).  doc_id is the numeric image index (int64 join/dedup key).
    Codec dispatch is per row; sample positions are shared constants."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for iid, fmt, buf in zip(t["image_id"].to_pylist(),
                                 t["fmt"].to_pylist(),
                                 t["bytes"].to_pylist()):
            hashes.append(dhash64_sampled(decode_image(buf, fmt)))
            ids.append(int(iid[3:]))
        return pa.table({"doc_id": pa.array(np.asarray(ids, np.int64)),
                         "dhash": pa.array(np.asarray(hashes, np.int64))})


_CAPTION_SUBJECTS = ["a lighthouse", "two kayaks", "an old bridge",
                     "a mountain trail", "a city skyline", "a red barn",
                     "a desert road", "a pine forest", "a river bend",
                     "a stone wall"]
_CAPTION_STYLES = ["at sunrise", "in heavy fog", "under a full moon",
                   "after the rain", "in late autumn", "at golden hour",
                   "during a storm", "in deep winter"]


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    """bytes -> (h, w, 3) uint8, dispatching on the fmt column."""
    if fmt == "png":
        return png_decode(buf)
    if fmt == "jpeg":
        return jpeg_decode(buf)
    raise ImageFormatNotSupported(f"no codec for fmt {fmt!r}")


def synth_image_rows(ids: np.ndarray, seed: int = 42,
                     fmt: str = "png", dup_rate: float = 0.0) -> pa.Table:
    """Deterministic image+caption rows for the given ids.

    fmt: 'png' (lossless), 'jpeg' (baseline, quality 98 — lossy with
    PSNR > 40 dB on this fixture), or 'mixed' (per-row hash choice).

    ``dup_rate`` > 0 seeds NEAR-DUPLICATE images: a hash-chosen fraction
    of rows re-renders an earlier row's pixels with ~1% of samples
    nudged by one level (visually identical, phash within a few bits) —
    the ground truth for perceptual-hash dedup.  Row i's dup source is
    a function of (seed, i) only, so the table stays batch-invariant.
    Dup rows keep their OWN caption; the per-row decode-verify
    invariant assumes dup_rate=0 (its re-synthesis is by row id)."""
    ids = np.asarray(ids, dtype=np.int64)
    if dup_rate > 0:
        isdup, src = dup_sources(ids, seed, dup_rate)
    else:
        isdup = np.zeros(len(ids), dtype=bool)
        src = ids
    widths = _SIZES[(rand01(src, seed, 20) * len(_SIZES)).astype(int)]
    heights = _SIZES[(rand01(src, seed, 21) * len(_SIZES)).astype(int)]
    subj = (rand01(ids, seed, 22) * len(_CAPTION_SUBJECTS)).astype(int)
    styl = (rand01(ids, seed, 23) * len(_CAPTION_STYLES)).astype(int)
    if fmt == "mixed":
        fmts = np.where(rand01(ids, seed, 24) < 0.5, "png", "jpeg")
    else:
        fmts = np.full(len(ids), fmt, dtype=object)
    image_ids, blobs, caps, hashes = [], [], [], []
    for k, i in enumerate(ids.tolist()):
        px = synth_pixels(int(src[k]), seed, int(widths[k]),
                          int(heights[k]))
        if isdup[k]:
            # deterministic +1-level nudge on ~1% of samples, keyed by
            # the DUP row id (two dups of one base stay distinct)
            flat = px.astype(np.int16).ravel()
            pert = rand01(np.int64(i) * np.int64(7919)
                          + np.arange(flat.size, dtype=np.int64),
                          seed, 42) < 0.01
            flat[pert] += 1
            px = np.clip(flat, 0, 255).astype(np.uint8).reshape(px.shape)
        blobs.append(png_encode(px) if fmts[k] == "png"
                     else jpeg_encode(px, JPEG_QUALITY))
        image_ids.append(f"img{i:08d}")
        caps.append(f"A photo of {_CAPTION_SUBJECTS[subj[k]]} "
                    f"{_CAPTION_STYLES[styl[k]]} (#{i}).")
        hashes.append(ahash64(px))
    return pa.table({
        "image_id": pa.array(image_ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(widths, pa.int32()),
        "h": pa.array(heights, pa.int32()),
        "fmt": pa.array(list(fmts), pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(hashes, pa.int64()),
    }, schema=IMAGE_SCHEMA)


def ray_image_table(n: int, seed: int = 42, parallelism: int = -1,
                    fmt: str = "png", dup_rate: float = 0.0):
    """Distributed deterministic image table (row i independent of batching).

    Wide binary rows: keep batches small so batch x concurrency fits worker heaps."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return synth_image_rows(
            batch["id"].to_numpy(zero_copy_only=False), seed, fmt,
            dup_rate)

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0
                  else None)
    return ds.map_batches(build, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
# decode / verify / transform stages (actor pools)
# ---------------------------------------------------------------------------

class DecodeImages:
    """Actor-pool stage: bytes -> flat pixel column + dims.

    Use as ``ds.map_batches(DecodeImages, concurrency=N, batch_size=64,
    batch_format="pyarrow")``.  png and baseline jpeg decode in-process
    (pure-Python codecs); other formats raise
    :class:`ImageFormatNotSupported` unless ``skip_undecodable``."""

    def __init__(self, skip_undecodable: bool = False):
        self.skip = skip_undecodable

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_px, out_w, out_h = [], [], [], []
        fmts = t["fmt"].to_pylist()
        bufs = t["bytes"].to_pylist()
        iids = t["image_id"].to_pylist()
        for iid, fmt, buf in zip(iids, fmts, bufs):
            try:
                px = decode_image(buf, fmt)
            except ImageFormatNotSupported:
                if self.skip:
                    continue
                raise
            out_id.append(iid)
            out_px.append(px.reshape(-1))
            out_w.append(px.shape[1])
            out_h.append(px.shape[0])
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "pixels": pa.array([p.tolist() for p in out_px],
                               pa.list_(pa.uint8())),
            "w": pa.array(out_w, pa.int32()),
            "h": pa.array(out_h, pa.int32()),
        })


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def make_verify_fn(seed: int = 42):
    """Per-row invariant stage (input_hint): decode bytes, PSNR vs the
    deterministically re-synthesized source pixels, caption equality."""

    def verify(t: pa.Table) -> pa.Table:
        ok_psnr, ok_cap, psnrs = [], [], []
        for row in t.to_pylist():
            i = int(row["image_id"][3:])
            px = decode_image(row["bytes"], row["fmt"])
            ref = synth_pixels(i, seed, row["w"], row["h"])
            p = psnr(px, ref)
            psnrs.append(p if np.isfinite(p) else 99.0)
            ok_psnr.append(p >= 40.0)
            subj = (rand01(np.array([i]), seed, 22)
                    * len(_CAPTION_SUBJECTS)).astype(int)[0]
            styl = (rand01(np.array([i]), seed, 23)
                    * len(_CAPTION_STYLES)).astype(int)[0]
            expect = (f"A photo of {_CAPTION_SUBJECTS[subj]} "
                      f"{_CAPTION_STYLES[styl]} (#{i}).")
            ok_cap.append(row["caption"] == expect)
        return pa.table({
            "image_id": t["image_id"],
            "psnr_ok": pa.array(ok_psnr, pa.bool_()),
            "caption_ok": pa.array(ok_cap, pa.bool_()),
            "psnr_db": pa.array(psnrs, pa.float64()),
        })

    return verify


class ResizeImages:
    """Actor-pool stage: decode -> box-mean resize -> re-encode PNG."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w = out_w
        self.out_h = out_h

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        ys = (np.arange(self.out_h + 1) * h) // self.out_h
        xs = (np.arange(self.out_w + 1) * w) // self.out_w
        out = np.empty((self.out_h, self.out_w, 3), dtype=np.uint8)
        f = px.astype(np.float64)
        for i in range(self.out_h):
            for j in range(self.out_w):
                out[i, j] = f[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(
                    axis=(0, 1)).round()
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for row in t.to_pylist():
            small = self._resize(decode_image(row["bytes"], row["fmt"]))
            ids.append(row["image_id"])
            blobs.append(png_encode(small))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([self.out_w] * len(ids), pa.int32()),
            "h": pa.array([self.out_h] * len(ids), pa.int32()),
            "fmt": pa.array(["png"] * len(ids), pa.string()),
        })


class PatchImages:
    """Actor-pool stage: split each image into a PxP grid of patches.

    Output: one row per patch (image_id, patch_x, patch_y, bytes, w, h) —
    the raster side of raster<->vector tiling."""

    def __init__(self, grid: int = 2):
        self.grid = grid

    def __call__(self, t: pa.Table) -> pa.Table:
        iid, pxs, pys, blobs, ws, hs = [], [], [], [], [], []
        g = self.grid
        for row in t.to_pylist():
            px = decode_image(row["bytes"], row.get("fmt", "png"))
            h, w, _ = px.shape
            ys = (np.arange(g + 1) * h) // g
            xs = (np.arange(g + 1) * w) // g
            for i in range(g):
                for j in range(g):
                    tile = px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                    iid.append(row["image_id"])
                    pys.append(i)
                    pxs.append(j)
                    blobs.append(png_encode(np.ascontiguousarray(tile)))
                    hs.append(tile.shape[0])
                    ws.append(tile.shape[1])
        return pa.table({
            "image_id": pa.array(iid, pa.string()),
            "patch_x": pa.array(pxs, pa.int32()),
            "patch_y": pa.array(pys, pa.int32()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        })


# ---------------------------------------------------------------------------
# geotags: every image gets a deterministic point (FIXTURES.md §2a)
# ---------------------------------------------------------------------------

def geotag_table(t: pa.Table, seed: int = 42, bounds=None) -> pa.Table:
    """image rows -> engine geometry table (id = row index from image_id).

    The geotag derives from the image row index (seeded), matching the
    synthesis of FIXTURES §2a.
    """
    from ..config import TIGER_US_BOUNDS
    from .synth import synth_points
    ids = np.array([int(s[3:]) for s in t["image_id"].to_pylist()],
                   dtype=np.int64)
    return synth_points(ids, seed, bounds=bounds or TIGER_US_BOUNDS)
