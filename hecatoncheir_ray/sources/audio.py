"""Audio table: real WAV (PCM16) codec via stdlib ``wave`` — the audio
leg of SURVEY's multimodal-column plan, upgraded from a stub (VERDICT r2
item 5).  Mirrors the image table's design (sources/images.py): opaque
``binary`` payload + typed metadata columns, deterministic hash-seeded
synthesis (batching-independent), actor-pool decode / feature stages,
and a per-row verify invariant (PCM is lossless -> bit equality, plus
caption equality per input_hint's pattern).

Schema: (media_id:string, bytes:binary, sr:int32, nchan:int32,
nframes:int32, fmt:string, caption:string).

Lossy/compressed formats: G.711 mu-law ('ulaw') and IMA ADPCM ('adpcm')
are REAL pure-numpy codecs (:mod:`.audio_codecs` — LUT companding and a
lane-vectorized 4-bit predictor), closing the r3 "compressed audio is a
stub" gap; mu-law meets the input_hint's PSNR >= 40 dB lossy floor on
the synth fixture (measured >= 43 dB), ADPCM's hard invariant is
bit-exact recode equality (+ a measured ~>= 20 dB floor — it is a 4:1
rate codec).  Formats with no in-container implementation (mp3/aac/...)
still raise :class:`~.images.AudioNotSupported`.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa

from .synth import rand01

AUDIO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr", pa.int32()),
    ("nchan", pa.int32()),
    ("nframes", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
])

_SRS = np.array([8000, 16000], dtype=np.int32)
_LABELS = ["a door closing", "rainfall on a roof", "a passing train",
           "wind through trees", "a church bell", "footsteps on gravel",
           "a boiling kettle", "distant thunder"]


def wav_encode(pcm: np.ndarray, sr: int) -> bytes:
    """(nframes, nchan) int16 -> WAV bytes (RIFF/PCM16)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sr))
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((nframes, nchan) int16, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        nchan = w.getnchannels()
        sr = int(w.getframerate())
        frames = w.readframes(w.getnframes())
    pcm = np.frombuffer(frames, dtype=np.int16).reshape(-1, nchan)
    return pcm, sr


def synth_pcm(idx: int, seed: int, sr: int, nframes: int,
              nchan: int) -> np.ndarray:
    """Deterministic (nframes, nchan) int16: two seeded sine tones +
    hash noise (same construction idea as images.synth_pixels)."""
    i = np.int64(idx)
    f0 = 80.0 + rand01(np.array([i]), seed, 50)[0] * 600.0
    f1 = 700.0 + rand01(np.array([i]), seed, 51)[0] * 2300.0
    a0 = 0.3 + rand01(np.array([i]), seed, 52)[0] * 0.4
    t = np.arange(nframes, dtype=np.float64) / sr
    sig = a0 * np.sin(2 * np.pi * f0 * t) \
        + (0.9 - a0) * np.sin(2 * np.pi * f1 * t)
    samp_idx = i * np.int64(1000003) + np.arange(nframes * nchan,
                                                 dtype=np.int64)
    noise = (rand01(samp_idx, seed, 53) - 0.5) * 0.05
    out = sig[:, None] + noise.reshape(nframes, nchan)
    return np.clip(out * 32767.0, -32768, 32767).astype(np.int16)


_FMT_CHOICES = ["wav", "ulaw", "adpcm"]


def _row_fmts(ids: np.ndarray, seed: int, fmts: str) -> list[str]:
    """Per-row format tags: a fixed codec name, or 'mixed' for a
    deterministic per-id hash choice (same pattern as images 'mixed')."""
    if fmts != "mixed":
        return [fmts] * len(ids)
    pick = (rand01(ids, seed, 58) * len(_FMT_CHOICES)).astype(int)
    return [_FMT_CHOICES[p] for p in pick]


def synth_audio_rows(ids: np.ndarray, seed: int = 42,
                     fmts: str = "wav") -> pa.Table:
    """Deterministic audio+caption rows for the ids.  ``fmts`` is 'wav'
    (lossless), 'ulaw'/'adpcm' (lossy, audio_codecs), or 'mixed'."""
    from .audio_codecs import adpcm_encode_batch, encode_any
    ids = np.asarray(ids, dtype=np.int64)
    srs = _SRS[(rand01(ids, seed, 54) * len(_SRS)).astype(int)]
    nch = 1 + (rand01(ids, seed, 55) > 0.7).astype(int)
    # 40-120 ms keeps rows small; payload size is a knob, not a semantic
    nfr = (srs * (0.04 + rand01(ids, seed, 56) * 0.08)).astype(int)
    lab = (rand01(ids, seed, 57) * len(_LABELS)).astype(int)
    row_fmt = _row_fmts(ids, seed, fmts)
    mids, blobs, caps = [], [], []
    adp_pcms, adp_srs, adp_pos = [], [], []
    for k, i in enumerate(ids.tolist()):
        pcm = synth_pcm(i, seed, int(srs[k]), int(nfr[k]), int(nch[k]))
        if row_fmt[k] == "adpcm":
            # defer: all adpcm rows encode through ONE lane-batched loop
            blobs.append(b"")
            adp_pcms.append(pcm)
            adp_srs.append(int(srs[k]))
            adp_pos.append(k)
        else:
            blobs.append(encode_any(pcm, int(srs[k]), row_fmt[k]))
        mids.append(f"aud{i:08d}")
        caps.append(f"The sound of {_LABELS[lab[k]]} (#{i}).")
    for pos, blob in zip(adp_pos, adpcm_encode_batch(adp_pcms, adp_srs)):
        blobs[pos] = blob
    return pa.table({
        "media_id": pa.array(mids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(srs, pa.int32()),
        "nchan": pa.array(nch.astype(np.int32), pa.int32()),
        "nframes": pa.array(nfr.astype(np.int32), pa.int32()),
        "fmt": pa.array(row_fmt, pa.string()),
        "caption": pa.array(caps, pa.string()),
    }, schema=AUDIO_SCHEMA)


def ray_audio_table(n: int, seed: int = 42, parallelism: int = -1,
                    fmts: str = "wav"):
    """Distributed deterministic audio table (row i independent of
    batching); small batches — binary payload rows are wide."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return synth_audio_rows(
            batch["id"].to_numpy(zero_copy_only=False), seed, fmts)

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0
                  else None)
    return ds.map_batches(build, batch_format="pyarrow", batch_size=512)


def decode_rows(t: pa.Table, skip_undecodable: bool = False):
    """Decode every row of an audio batch -> (media_ids, pcms, srs).

    ADPCM rows are decoded TOGETHER through one lane-vectorized time loop
    (audio_codecs.adpcm_decode_batch) — the sequential predictor runs
    once per batch across all (row, channel) lanes, not once per row.
    wav/ulaw decode row-wise (both are O(bytes) buffer reshapes)."""
    from .audio_codecs import adpcm_decode, adpcm_decode_batch, decode_any
    mids_in = t["media_id"].to_pylist()
    fmts = t["fmt"].to_pylist()
    bufs = t["bytes"].to_pylist()
    adp_idx = [k for k, f in enumerate(fmts) if f == "adpcm"]
    try:
        adp_out = dict(zip(adp_idx,
                           adpcm_decode_batch([bufs[k] for k in adp_idx])))
    except Exception:
        # one corrupt blob must not take the whole lane batch down —
        # fall back to per-row decode; failures re-raise (or skip) below
        adp_out = {}
        for k in adp_idx:
            try:
                adp_out[k] = adpcm_decode(bufs[k])
            except Exception:
                # typed skip: leave the row to the per-row path below,
                # which re-raises (or skips) with the real codec error
                continue
    mids, pcms, srs = [], [], []
    for k, (mid, fmt, buf) in enumerate(zip(mids_in, fmts, bufs)):
        try:
            pcm, sr = adp_out[k] if k in adp_out else decode_any(buf, fmt)
        except Exception:
            # AudioNotSupported for unknown fmts, or whatever the codec
            # raised on a corrupt payload (wave raises EOFError/Error)
            if skip_undecodable:
                continue
            raise
        mids.append(mid)
        pcms.append(pcm)
        srs.append(sr)
    return mids, pcms, srs


class DecodeAudio:
    """Actor-pool stage: audio bytes -> flat int16 sample column + dims.

    ``ds.map_batches(DecodeAudio, concurrency=N, batch_size=256,
    batch_format="pyarrow")``.  Decodes wav/ulaw/adpcm (adpcm through
    the batch lane decoder); other formats raise
    :class:`~.images.AudioNotSupported` unless ``skip_undecodable``."""

    def __init__(self, skip_undecodable: bool = False):
        self.skip = skip_undecodable

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, pcms, srs0 = decode_rows(t, self.skip)
        samples = [p.reshape(-1) for p in pcms]
        srs = list(srs0)
        nchs = [p.shape[1] for p in pcms]
        nfrs = [p.shape[0] for p in pcms]
        flat = np.concatenate(samples) if samples else \
            np.zeros(0, dtype=np.int16)
        offs = np.zeros(len(samples) + 1, dtype=np.int32)
        if samples:
            np.cumsum([len(s) for s in samples], out=offs[1:])
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "samples": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(flat, type=pa.int16())),
            "sr": pa.array(srs, pa.int32()),
            "nchan": pa.array(nchs, pa.int32()),
            "nframes": pa.array(nfrs, pa.int32()),
        })


class AudioFeatures:
    """Actor-pool stage: audio bytes -> per-row features (duration, RMS,
    peak, zero-crossing rate), vectorized per row over the PCM array.
    Decodes all three in-container codecs via :func:`decode_rows`."""

    def __init__(self, skip_undecodable: bool = True):
        self.skip = skip_undecodable

    def __call__(self, t: pa.Table) -> pa.Table:
        mids_d, pcms, srs_d = decode_rows(t, self.skip)
        mids, dur, rms, peak, zcr = [], [], [], [], []
        for mid, pcm, sr in zip(mids_d, pcms, srs_d):
            x = pcm.astype(np.float64) / 32768.0
            mono = x.mean(axis=1)
            mids.append(mid)
            dur.append(pcm.shape[0] / sr)
            rms.append(float(np.sqrt(np.mean(x * x))))
            peak.append(float(np.abs(x).max(initial=0.0)))
            zcr.append(float(np.mean(np.signbit(mono[1:])
                                     != np.signbit(mono[:-1])))
                       if len(mono) > 1 else 0.0)
        return pa.table({
            "media_id": pa.array(mids, pa.string()),
            "duration_s": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "peak": pa.array(peak, pa.float64()),
            "zcr": pa.array(zcr, pa.float64()),
        })


# per-codec PSNR floors, pinned from measurement (tests/test_audio.py):
# wav is lossless (inf), mu-law measures >= 43 dB on the synth fixture
# (satisfying the input_hint's >= 40 dB lossy bar), 4-bit IMA ADPCM is a
# 4:1 rate codec whose hard invariant is bit-exact recode equality.
PSNR_FLOOR = {"wav": float("inf"), "ulaw": 40.0, "adpcm": 20.0}


def make_audio_verify_fn(seed: int = 42):
    """Per-row invariant stage (input_hint pattern): the stored payload
    must be the EXACT deterministic encoding of the re-synthesized source
    (decode(bytes) bit-equals decode(encode(ref))), decoded PCM must
    clear the codec's PSNR floor vs the source, caption must match."""
    from .audio_codecs import decode_any, encode_any, psnr_int16

    from .audio_codecs import adpcm_decode_batch, adpcm_encode_batch

    def verify(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        _, pcms, srs_d = decode_rows(t)  # adpcm rows lane-batched
        refs = [synth_pcm(int(r["media_id"][3:]), seed, r["sr"],
                          r["nframes"], r["nchan"]) for r in rows]
        # expected decode of the deterministic re-encoding, adpcm batched
        adp = [k for k, r in enumerate(rows) if r["fmt"] == "adpcm"]
        adp_exp = adpcm_decode_batch(adpcm_encode_batch(
            [refs[k] for k in adp], [rows[k]["sr"] for k in adp]))
        exp_map = {k: e[0] for k, e in zip(adp, adp_exp)}
        ok_pcm, ok_cap, psnrs = [], [], []
        for k, (row, pcm, sr, ref) in enumerate(
                zip(rows, pcms, srs_d, refs)):
            fmt = row["fmt"]
            i = int(row["media_id"][3:])
            if fmt == "wav":
                exp = ref
            elif fmt == "adpcm":
                exp = exp_map[k]
            else:
                exp = decode_any(encode_any(ref, row["sr"], fmt), fmt)[0]
            p = psnr_int16(pcm, ref) if pcm.shape == ref.shape else 0.0
            psnrs.append(p if np.isfinite(p) else 99.0)
            bit_ok = (sr == row["sr"] and pcm.shape == exp.shape
                      and bool((pcm == exp).all()))
            ok_pcm.append(bit_ok and (fmt == "wav"
                                      or p >= PSNR_FLOOR[fmt] - 1e-9))
            lab = (rand01(np.array([np.int64(i)]), seed, 57)
                   * len(_LABELS)).astype(int)[0]
            ok_cap.append(row["caption"]
                          == f"The sound of {_LABELS[lab]} (#{i}).")
        return pa.table({
            "media_id": t["media_id"],
            "pcm_ok": pa.array(ok_pcm, pa.bool_()),
            "caption_ok": pa.array(ok_cap, pa.bool_()),
            "psnr_db": pa.array(psnrs, pa.float64()),
        })

    return verify
