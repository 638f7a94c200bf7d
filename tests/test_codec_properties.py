"""Property-based tests (hypothesis) for the pure-numpy media codecs.

The pinned fixture tests assert exact behavior on the synth corpus;
hypothesis explores adversarial payloads (extreme pixel/sample values,
odd shapes, non-block-aligned sizes) and SHRINKS failures.  Invariants
are the codec contracts the verify stages rely on: shape/dtype/metadata
preservation, encode determinism, quantizer fixpoints, and batch-lane
equivalence with per-row decode.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from hecatoncheir_ray.sources.audio_codecs import (adpcm_decode,
                                                   adpcm_decode_batch,
                                                   adpcm_encode,
                                                   ulaw_decode,
                                                   ulaw_decode_samples,
                                                   ulaw_encode,
                                                   ulaw_encode_samples)
from hecatoncheir_ray.sources.jpeg import jpeg_decode, jpeg_encode

# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------

dims = st.integers(min_value=1, max_value=24)
quality = st.sampled_from([1, 25, 50, 75, 90, 98, 100])


@st.composite
def rgb_images(draw):
    h = draw(dims)
    w = draw(dims)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "extreme", "smooth"]))
    if kind == "noise":
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), draw(st.integers(0, 255)), np.uint8)
    if kind == "extreme":
        return rng.choice(np.array([0, 255], np.uint8), size=(h, w, 3))
    base = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64)
    for ax in (0, 1):
        base = (base + np.roll(base, 1, axis=ax)) / 2
    return base.astype(np.uint8)


@settings(max_examples=60, deadline=None)
@given(rgb_images(), quality)
def test_jpeg_roundtrip_shape_dtype_determinism(px, q):
    b1 = jpeg_encode(px, q)
    assert jpeg_encode(px, q) == b1          # deterministic encode
    out = jpeg_decode(b1)
    assert out.shape == px.shape and out.dtype == np.uint8
    assert (jpeg_decode(b1) == out).all()    # deterministic decode


@settings(max_examples=40, deadline=None)
@given(rgb_images())
def test_jpeg_flat_stays_flat(px):
    """A uniform image must decode to a uniform image at any quality
    (DC-only blocks; quantization may shift the level, not the
    uniformity)."""
    flat = np.full_like(px, int(px[0, 0, 0]))
    out = jpeg_decode(jpeg_encode(flat, 75))
    assert (out == out[0, 0]).all()


@settings(max_examples=60, deadline=None)
@given(rgb_images(), st.integers(2, 200), st.integers(0, 255))
def test_jpeg_corrupt_tail_never_hangs(px, cut, fill):
    """Truncating/overwriting the stream must either raise or return an
    image — never crash the interpreter or loop forever."""
    b = bytearray(jpeg_encode(px, 90))
    b[-min(cut, len(b) - 2):] = bytes([fill]) * min(cut, len(b) - 2)
    try:
        out = jpeg_decode(bytes(b))
        assert isinstance(out, np.ndarray)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# audio codecs
# ---------------------------------------------------------------------------

pcm16 = st.integers(min_value=-32768, max_value=32767)


@st.composite
def pcm_arrays(draw):
    n = draw(st.integers(1, 400))
    ch = draw(st.integers(1, 3))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "extreme", "quiet"]))
    if kind == "noise":
        return rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    if kind == "extreme":
        return rng.choice(
            np.array([-32768, -32767, 0, 32766, 32767], np.int16),
            size=(n, ch))
    return rng.integers(-64, 64, (n, ch)).astype(np.int16)


@settings(max_examples=80, deadline=None)
@given(pcm_arrays(), st.sampled_from([8000, 16000, 44100]))
def test_ulaw_quantizer_fixpoint_and_shape(pcm, sr):
    blob = ulaw_encode(pcm, sr)
    assert ulaw_encode(pcm, sr) == blob
    dec, sr2 = ulaw_decode(blob)
    assert sr2 == sr and dec.shape == pcm.shape and dec.dtype == np.int16
    # re-encoding the decoded lattice points is the identity
    assert ulaw_encode(dec, sr) == blob or (
        ulaw_encode_samples(dec.reshape(-1))
        == ulaw_encode_samples(ulaw_decode_samples(
            ulaw_encode_samples(pcm.reshape(-1))))).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_ulaw_monotone_code_space(seed):
    """Decode of the 256 code points is monotone within each sign half
    — companding must preserve order."""
    dec = ulaw_decode_samples(np.arange(256, dtype=np.uint8))
    neg, pos = dec[:128], dec[128:]
    assert (np.diff(neg.astype(np.int64)) > 0).all()
    assert (np.diff(pos.astype(np.int64)) < 0).all()


@settings(max_examples=60, deadline=None)
@given(pcm_arrays(), st.sampled_from([8000, 16000]))
def test_adpcm_roundtrip_contract(pcm, sr):
    blob = adpcm_encode(pcm, sr)
    assert adpcm_encode(pcm, sr) == blob     # deterministic
    dec, sr2 = adpcm_decode(blob)
    assert sr2 == sr and dec.shape == pcm.shape and dec.dtype == np.int16
    assert (dec[0] == pcm[0]).all()          # frame 0 stored verbatim
    # batch lane decoder == per-row decoder, any mix of shapes
    (bdec, bsr), = adpcm_decode_batch([blob])
    assert bsr == sr and (bdec == dec).all()
    # recode of the decoded signal is a fixpoint after one step
    blob2 = adpcm_encode(dec, sr)
    dec2, _ = adpcm_decode(blob2)
    assert dec2.shape == dec.shape


@settings(max_examples=25, deadline=None)
@given(st.lists(pcm_arrays(), min_size=1, max_size=6),
       st.sampled_from([8000, 16000]))
def test_adpcm_batch_decode_matches_per_row(pcms, sr):
    blobs = [adpcm_encode(p, sr) for p in pcms]
    outs = adpcm_decode_batch(blobs)
    for blob, (bp, bsr) in zip(blobs, outs):
        sp, ssr = adpcm_decode(blob)
        assert bsr == ssr and (bp == sp).all()
