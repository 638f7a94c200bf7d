"""Audio path (stdlib wave; VERDICT r2 item 5): codec roundtrip,
deterministic synthesis, actor-pool decode/feature stages, verify
invariant (lossless PCM -> bit equality + caption equality)."""

import numpy as np
import pyarrow as pa

from hecatoncheir_ray.sources.audio import (AudioFeatures, DecodeAudio,
                                            make_audio_verify_fn,
                                            ray_audio_table,
                                            synth_audio_rows, wav_decode,
                                            wav_encode)


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    for nchan in (1, 2):
        pcm = rng.integers(-32768, 32767, size=(1234, nchan),
                           dtype=np.int16)
        out, sr = wav_decode(wav_encode(pcm, 16000))
        assert sr == 16000
        assert out.shape == (1234, nchan)
        assert (out == pcm).all()


def test_synth_rows_deterministic_and_batching_independent():
    a = synth_audio_rows(np.arange(20), seed=42)
    b1 = synth_audio_rows(np.arange(10), seed=42)
    b2 = synth_audio_rows(np.arange(10, 20), seed=42)
    b = pa.concat_tables([b1, b2])
    assert a.equals(b)
    # metadata columns agree with the actual WAV payload
    for row in a.to_pylist():
        pcm, sr = wav_decode(row["bytes"])
        assert sr == row["sr"]
        assert pcm.shape == (row["nframes"], row["nchan"])


def test_decode_stage_shapes():
    t = synth_audio_rows(np.arange(8), seed=1)
    out = DecodeAudio()(t)
    assert out.column_names == ["media_id", "samples", "sr", "nchan",
                                "nframes"]
    for row, src in zip(out.to_pylist(), t.to_pylist()):
        assert len(row["samples"]) == src["nframes"] * src["nchan"]


def test_features_stage_values():
    t = synth_audio_rows(np.arange(12), seed=2)
    f = AudioFeatures()(t)
    assert len(f) == 12
    d = f.to_pylist()
    assert all(0.0 < r["rms"] <= r["peak"] <= 1.0 for r in d)
    assert all(0.03 < r["duration_s"] < 0.15 for r in d)
    assert all(0.0 < r["zcr"] < 1.0 for r in d)


def test_ray_audio_pipeline_and_verify(ray_session):
    """End-to-end: distributed table -> actor-pool verify stage; every
    row satisfies the lossless-PCM + caption invariant."""
    ds = ray_audio_table(300, seed=42)
    ver = ds.map_batches(make_audio_verify_fn(42), batch_format="pyarrow",
                         batch_size=64)
    rows = ver.take_all()
    assert len(rows) == 300
    assert all(r["pcm_ok"] for r in rows)
    assert all(r["caption_ok"] for r in rows)
    feats = ds.map_batches(AudioFeatures, concurrency=2,
                           batch_format="pyarrow", batch_size=64)
    assert feats.count() == 300


# ---------------------------------------------------------------------------
# lossy codecs (audio_codecs: G.711 mu-law + IMA ADPCM) — round 4
# ---------------------------------------------------------------------------

from hecatoncheir_ray.sources.audio import synth_pcm  # noqa: E402
from hecatoncheir_ray.sources.audio_codecs import (  # noqa: E402
    adpcm_decode, adpcm_decode_batch, adpcm_encode, ima_decode_lanes,
    ima_encode_lanes, psnr_int16, ulaw_decode, ulaw_decode_samples,
    ulaw_encode, ulaw_encode_samples)


def test_ulaw_code_space_idempotent():
    """decode(encode(decode(c))) == decode(c) for every one of the 256
    code bytes — the companding quantizer is a fixpoint on its lattice."""
    codes = np.arange(256, dtype=np.uint8)
    dec = ulaw_decode_samples(codes)
    assert (ulaw_decode_samples(ulaw_encode_samples(dec)) == dec).all()


def test_ulaw_meets_input_hint_psnr_floor():
    """mu-law on the synth fixture clears the input_hint's lossy bar
    (PSNR >= 40 dB); measured >= 43 dB, pinned with margin."""
    for i in range(40):
        sr = [8000, 16000][i % 2]
        pcm = synth_pcm(i, 42, sr, int(sr * 0.08), 1 + (i % 3 == 0))
        dec, sr2 = ulaw_decode(ulaw_encode(pcm, sr))
        assert sr2 == sr and dec.shape == pcm.shape
        assert psnr_int16(dec, pcm) >= 40.0


def test_adpcm_scalar_reference_vs_lanes():
    """Lane-vectorized IMA ADPCM == an independent per-sample scalar
    reference implementation of the published algorithm."""
    step_t = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
              31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
              118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337,
              371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
              1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
              2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
              7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
              16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
    idx_t = [-1, -1, -1, -1, 2, 4, 6, 8]

    def scalar_encode(xs, pred):
        index, out = 0, []
        for s in xs:
            step = step_t[index]
            diff = int(s) - pred
            sign = diff < 0
            d = abs(diff)
            delta = 0
            if d >= step:
                delta |= 4
                d -= step
            if d >= step >> 1:
                delta |= 2
                d -= step >> 1
            if d >= step >> 2:
                delta |= 1
            diffq = (step >> 3) + (step if delta & 4 else 0) \
                + ((step >> 1) if delta & 2 else 0) \
                + ((step >> 2) if delta & 1 else 0)
            pred = max(-32768, min(32767, pred - diffq if sign
                                   else pred + diffq))
            index = max(0, min(88, index + idx_t[delta]))
            out.append(delta | (8 if sign else 0))
        return out

    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32767, size=(700, 3), dtype=np.int16)
    pred0 = x_first = rng.integers(-2000, 2000, size=3).astype(np.int16)
    lanes = ima_encode_lanes(x, pred0)
    for lane in range(3):
        ref = scalar_encode(x[:, lane], int(x_first[lane]))
        assert lanes[:, lane].tolist() == ref


def test_adpcm_roundtrip_and_batch_lane_decode():
    """Container roundtrip is deterministic; the batch lane decoder
    (one time loop for the whole batch) bit-matches per-row decode."""
    blobs, pcms = [], []
    for i in range(24):
        sr = [8000, 16000][i % 2]
        pcm = synth_pcm(i, 42, sr, int(sr * (0.04 + 0.005 * (i % 9))),
                        1 + (i % 2))
        pcms.append((pcm, sr))
        blobs.append(adpcm_encode(pcm, sr))
    assert adpcm_encode(pcms[0][0], pcms[0][1]) == blobs[0]  # determinism
    batch = adpcm_decode_batch(blobs)
    for (bp, bsr), blob, (pcm, sr) in zip(batch, blobs, pcms):
        sp, ssr = adpcm_decode(blob)
        assert bsr == ssr == sr
        assert (bp == sp).all()
        assert bp.shape == pcm.shape
        assert (bp[0] == pcm[0]).all()  # frame 0 stored verbatim
        assert psnr_int16(bp, pcm) >= 20.0


def test_mixed_format_table_decode_features_verify(ray_session):
    """'mixed' table (wav/ulaw/adpcm per-row hash choice) flows through
    DecodeAudio, AudioFeatures and the fmt-aware verify stage; every row
    clears its codec's invariant (bit-exact recode + PSNR floor)."""
    from hecatoncheir_ray.sources.audio import ray_audio_table as rat
    t = synth_audio_rows(np.arange(60), seed=42, fmts="mixed")
    fmts = set(t["fmt"].to_pylist())
    assert fmts == {"wav", "ulaw", "adpcm"}
    dec = DecodeAudio()(t)
    assert len(dec) == 60
    for row, src in zip(dec.to_pylist(), t.to_pylist()):
        assert len(row["samples"]) == src["nframes"] * src["nchan"]
    feats = AudioFeatures()(t)
    assert len(feats) == 60
    ver = rat(150, seed=42, fmts="mixed").map_batches(
        make_audio_verify_fn(42), batch_format="pyarrow", batch_size=64)
    rows = ver.take_all()
    assert len(rows) == 150
    assert all(r["pcm_ok"] and r["caption_ok"] for r in rows)
    lossy = [r for r in rows if r["psnr_db"] < 99.0]
    assert lossy and all(r["psnr_db"] >= 20.0 for r in lossy)
