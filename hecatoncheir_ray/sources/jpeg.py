"""Pure-numpy baseline JPEG codec (encoder + decoder).

Makes the BASELINE.json input_hint's LOSSY per-row invariant
(decoded-pixel PSNR >= 40 dB) testable on a real lossy format in this
codec-library-free container: a minimal but real baseline JFIF
implementation — YCbCr 4:4:4, 8x8 DCT, Annex-K quantization tables
scaled by quality, Annex-K Huffman tables, byte stuffing, DC
prediction, ZRL/EOB run-length coding.

Scope (documented, checked at decode):
* baseline sequential DCT only (SOF0), 8-bit, 3 components, no
  subsampling on the ENCODER side (the decoder accepts any sampling
  declared 1x1), no restart markers, no progressive/arithmetic modes.
* the decoder reads quant + Huffman tables from the stream, so
  roundtrip correctness is self-contained; table values match ITU
  T.81 Annex K so real decoders can read the output, but that cannot
  be cross-checked in this container.

The DCT is exact float64 matrix math (F = C f C^T with the orthonormal
cosine basis), vectorized over all blocks of an image via einsum; only
the entropy coding loops per block (<= a few hundred blocks per image
at this table's sizes).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: k-th entry = row-major index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIG = np.argsort(ZIGZAG)

_QL = np.array([           # Annex K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
_QC = np.array([           # Annex K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# Annex K.3 Huffman specs: (bits[1..16] counts, values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _dct_basis() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    C = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    C[0] *= 1 / np.sqrt(2)
    return C


_C = _dct_basis()


def _quant_tables(quality: int):
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return ql, qc


def _huff_codes(bits, vals):
    """Canonical JPEG Huffman: {value: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_code_arrays(bits, vals, n: int):
    """Canonical spec -> (code[n], len[n]) arrays for vectorized
    symbol-to-code lookup (np.take instead of a dict per symbol)."""
    d = _huff_codes(bits, vals)
    code = np.zeros(n, dtype=np.int64)
    ln = np.zeros(n, dtype=np.int64)
    for k, (cd, l) in d.items():
        code[k] = cd
        ln[k] = l
    return code, ln


_ENC_TABS = None


def _enc_tables():
    global _ENC_TABS
    if _ENC_TABS is None:
        _ENC_TABS = ([_huff_code_arrays(*_DC_L, 12),
                      _huff_code_arrays(*_DC_C, 12)],
                     [_huff_code_arrays(*_AC_L, 256),
                      _huff_code_arrays(*_AC_C, 256)])
    return _ENC_TABS


def _entropy_encode(planes, nb: int) -> bytes:
    """Interleaved MCU entropy stream for 3 full-resolution components,
    assembled WITHOUT a per-block Python loop: magnitude categories,
    zero-runs, ZRL repetitions, EOB flags and the block-major component
    interleave are all computed as numpy scatters into one global
    (code, len) element array, then bit-packed by :func:`_emit_bits`.
    Produces bit-identical output to the symbol-at-a-time reference
    loop (pinned by the encode-determinism tests)."""
    dc_t, ac_t = _enc_tables()
    tot = np.zeros((nb, 3), dtype=np.int64)     # elements per (block, c)
    parts = []
    for c in range(3):
        tb = 0 if c == 0 else 1
        Z = planes[c].reshape(nb, 64).astype(np.int64)
        dsz, dbits = _mag_vec(np.diff(Z[:, 0], prepend=0))  # DC pred
        rows, kcols = np.nonzero(Z[:, 1:])
        kcols = kcols + 1
        asz, abits = _mag_vec(Z[rows, kcols])
        starts = np.searchsorted(rows, np.arange(nb + 1))
        nzb = starts[:-1] < starts[1:]          # block has nonzero ACs
        first = np.zeros(len(kcols), dtype=bool)
        first[starts[:-1][nzb]] = True
        prev = np.concatenate(([0], kcols[:-1])) if len(kcols) else kcols
        runs = kcols - np.where(first, 0, prev) - 1
        z = runs >> 4                           # ZRL count before each AC
        rem = runs & 15
        last = np.zeros(nb, dtype=np.int64)     # block's last nonzero k
        last[nzb] = kcols[starts[1:][nzb] - 1] if len(kcols) else 0
        eob = last < 63
        dc_n = 1 + (dsz > 0)
        acc = np.concatenate(([0], np.cumsum(z + 2)))
        ac_blk = acc[starts[1:]] - acc[starts[:-1]]
        tot[:, c] = dc_n + ac_blk + eob
        parts.append((tb, dsz, dbits, rows, asz, abits, starts, z, rem,
                      eob, dc_n, acc))
    goff = np.concatenate(([0], np.cumsum(tot.ravel())))
    total = int(goff[-1])
    base2 = goff[:-1].reshape(nb, 3)
    codes = np.zeros(total, dtype=np.int64)
    lens = np.zeros(total, dtype=np.int64)
    for c in range(3):
        tb, dsz, dbits, rows, asz, abits, starts, z, rem, eob, dc_n, acc \
            = parts[c]
        dcode, dlen = dc_t[tb]
        acode, alen = ac_t[tb]
        base = base2[:, c]
        codes[base] = dcode[dsz]                # DC Huffman symbol
        lens[base] = dlen[dsz]
        sel = dsz > 0
        codes[base[sel] + 1] = dbits[sel]       # DC magnitude bits
        lens[base[sel] + 1] = dsz[sel]
        if len(rows):
            ac_pos = (base + dc_n)[rows] \
                + (acc[:-1] - acc[starts[rows]])
            zt = int(z.sum())
            if zt:                              # ZRL fills, rare
                jz = np.repeat(np.arange(len(z)), z)
                inner = np.arange(zt) \
                    - np.repeat(np.concatenate(([0], np.cumsum(z)))[:-1],
                                z)
                codes[ac_pos[jz] + inner] = acode[0xF0]
                lens[ac_pos[jz] + inner] = alen[0xF0]
            sym = (rem << 4) | asz
            codes[ac_pos + z] = acode[sym]      # AC Huffman symbol
            lens[ac_pos + z] = alen[sym]
            codes[ac_pos + z + 1] = abits       # AC magnitude bits
            lens[ac_pos + z + 1] = asz
        epos = (base + tot[:, c] - 1)[eob]
        codes[epos] = acode[0x00]               # EOB
        lens[epos] = alen[0x00]
    return _emit_bits(codes, lens)


def _emit_bits(codes, lens) -> bytes:
    """(code, nbits) symbol stream -> packed, byte-stuffed entropy bytes
    (tail padded with 1-bits per T.81).  One vectorized pass replaces a
    per-symbol big-int bit accumulator: expand every code to its bit row,
    mask to its length, packbits, then bytes.replace for stuffing."""
    c = np.asarray(codes, dtype=np.int64)
    ln = np.asarray(lens, dtype=np.int64)
    total = int(ln.sum())
    pad = (-total) % 8
    if pad:
        c = np.append(c, (1 << pad) - 1)
        ln = np.append(ln, pad)
    ar = np.arange(16)
    m = ar[None, :] < ln[:, None]
    sh = np.where(m, ln[:, None] - 1 - ar[None, :], 0)
    bits = ((c[:, None] >> sh) & 1).astype(np.uint8)
    return np.packbits(bits[m]).tobytes().replace(b"\xff", b"\xff\x00")


def _mag_vec(v: np.ndarray):
    """Vectorized magnitude coding: (category sizes, code bits) for an
    int64 array of DC diffs / AC values (T.81 F.1.2.1: negatives code as
    v + 2^size - 1).  frexp's exponent IS bit_length for |v| < 2^53."""
    sz = np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)
    bits = np.where(v >= 0, v, v + (1 << sz) - 1)
    return sz, bits


def _encode_plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(h, w) float64 -> (nby, nbx, 64) int32 zigzagged quantized coefs."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    F = np.einsum("ux,ijxy,vy->ijuv", _C, blocks - 128.0, _C)
    q = np.round(F / qtab.reshape(8, 8)).astype(np.int32)
    return q.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]


def _rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    h, w, _ = pixels.shape
    ql, qc = _quant_tables(quality)
    ycc = _rgb_to_ycc(pixels)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    if (ph, pw) != (h, w):            # edge-replicate pad to block grid
        ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    planes = [_encode_plane_blocks(ycc[..., c], ql if c == 0 else qc)
              for c in range(3)]

    nby, nbx = ph // 8, pw // 8
    nb = nby * nbx
    entropy = _entropy_encode(planes, nb)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid])
                   + bytes(tab[ZIGZAG].astype(np.uint8).tolist()))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + b"\x00\x00")
    return (b"\xff\xd8" + app0 + dqt(0, ql) + dqt(1, qc)
            + dht(0, 0, _DC_L) + dht(1, 0, _AC_L)
            + dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
            + sof + sos + entropy + b"\xff\xd9")


def _bit_windows(data: bytes) -> list:
    """De-stuffed entropy bytes -> per-byte-offset 32-bit windows, as a
    Python int list: U[i] holds bits 8i..8i+31, so the 16 bits at any
    bit position p are ``(U[p >> 3] >> (16 - (p & 7))) & 0xFFFF`` — one
    list index + shift per Huffman symbol instead of a per-bit loop.
    Zero padding past the end mirrors the old reader's 0-byte overrun."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    b = np.append(b, np.zeros(8, dtype=np.int64))
    u = (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
    return u.tolist()


_LUT_CACHE: dict = {}


def _huff_lut(bits, vals):
    """Canonical table spec -> (symbol, codelen) lookup over every
    16-bit window: decode = ONE indexed load instead of a bit walk.
    Cached by spec (Annex-K tables recur across every image)."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.full(65536, -1, dtype=np.int32)
    lng = np.zeros(65536, dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            sym[lo:lo + (1 << (16 - ln))] = vals[k]
            lng[lo:lo + (1 << (16 - ln))] = ln
            code += 1
            k += 1
        code <<= 1
    out = (sym.tolist(), lng.tolist())
    _LUT_CACHE[key] = out
    return out


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    h = w = None
    comps = []                    # (cid, qid)
    scan = []                     # (cid, dc_tid, ac_tid)
    data_start = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        payload = buf[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                tid = payload[p] & 0x0F
                if payload[p] >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(payload[p + 1:p + 65],
                                    dtype=np.uint8).astype(np.float64)
                qtabs[tid] = tab[UNZIG]        # store row-major
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls_tid = payload[p]
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                htabs[(cls_tid >> 4, cls_tid & 0x0F)] = \
                    _huff_lut(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline")
            for c in range(nc):
                cid, samp, qid = payload[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampling unsupported")
                comps.append((cid, qid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDA:
            ns = payload[0]
            for c in range(ns):
                cid = payload[1 + 2 * c]
                tids = payload[2 + 2 * c]
                scan.append((cid, tids >> 4, tids & 0x0F))
            data_start = pos
            break
    if data_start is None or h is None:
        raise ValueError("truncated JPEG")
    end = buf.rfind(b"\xff\xd9")
    scan_bytes = buf[data_start:end if end > 0 else len(buf)] \
        .replace(b"\xff\x00", b"\xff")          # de-stuff
    u = _bit_windows(scan_bytes)

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    nby, nbx = ph // 8, pw // 8
    nb = nby * nbx
    qid_of = dict(comps)
    luts = [(htabs[(0, dc_t)], htabs[(1, ac_t)])
            for cid, dc_t, ac_t in scan]
    # entropy decode: Python ints + LUT loads only; coefficients land in
    # sparse (block, zigzag-k, value) triplets, IDCT'd vectorized below
    dcv = [[0] * nb for _ in range(3)]
    rows: list = [[] for _ in range(3)]
    cols: list = [[] for _ in range(3)]
    vals: list = [[] for _ in range(3)]
    pred = [0, 0, 0]
    p = 0
    ncomp = len(scan)
    for b in range(nb):
        for ci in range(ncomp):
            dsym, dlen = luts[ci][0]
            asym, alen = luts[ci][1]
            wd = (u[p >> 3] >> (16 - (p & 7))) & 0xFFFF
            size = dsym[wd]
            if size < 0:
                raise ValueError("bad Huffman code")
            p += dlen[wd]
            if size:
                v = ((u[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - size)
                p += size
                pred[ci] += v if v >= (1 << (size - 1)) \
                    else v - (1 << size) + 1
            dcv[ci][b] = pred[ci]
            k = 1
            while k < 64:
                wd = (u[p >> 3] >> (16 - (p & 7))) & 0xFFFF
                rs = asym[wd]
                if rs < 0:
                    raise ValueError("bad Huffman code")
                p += alen[wd]
                if rs == 0x00:          # EOB
                    break
                if rs == 0xF0:          # ZRL
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0x0F
                if k > 63:
                    raise ValueError("AC index overflow")
                if size:
                    v = ((u[p >> 3] >> (16 - (p & 7))) & 0xFFFF) \
                        >> (16 - size)
                    p += size
                    rows[ci].append(b)
                    cols[ci].append(k)
                    vals[ci].append(v if v >= (1 << (size - 1))
                                    else v - (1 << size) + 1)
                k += 1
    planes = np.zeros((3, ph, pw), dtype=np.float64)
    for ci, (cid, dc_t, ac_t) in enumerate(scan):
        zz = np.zeros((nb, 64), dtype=np.float64)
        zz[:, 0] = dcv[ci]
        if rows[ci]:
            zz[rows[ci], cols[ci]] = vals[ci]
        blk = np.zeros((nb, 64), dtype=np.float64)
        blk[:, ZIGZAG] = zz                     # un-zigzag to row-major
        blk = blk.reshape(nb, 8, 8) * qtabs[qid_of[cid]].reshape(8, 8)
        # same per-block (C.T @ blk) @ C contraction, batched over blocks
        pix = np.matmul(np.matmul(_C.T, blk), _C) + 128.0
        planes[ci] = pix.reshape(nby, nbx, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(ph, pw)
    ycc = np.stack([planes[0], planes[1], planes[2]],
                   axis=-1)[:h, :w, :]
    return _ycc_to_rgb(ycc)
