"""Audio table: real WAV (PCM16) codec via stdlib ``wave`` — the audio
leg of SURVEY's multimodal-column plan, upgraded from a stub (VERDICT r2
item 5).  Mirrors the image table's design (sources/images.py): opaque
``binary`` payload + typed metadata columns, deterministic hash-seeded
synthesis (batching-independent), actor-pool decode / feature stages,
and a per-row verify invariant (PCM is lossless -> bit equality, plus
caption equality per input_hint's pattern).

Schema: (media_id:string, bytes:binary, sr:int32, nchan:int32,
nframes:int32, fmt:string, caption:string).

Compressed formats (mp3/aac/...) remain behind
:class:`~.images.AudioNotSupported` — no codec libraries exist in this
container; the Ray-side plumbing treats them identically to wav.
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


def synth_audio_rows(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Deterministic audio+caption rows (real WAV bytes) for the ids."""
    ids = np.asarray(ids, dtype=np.int64)
    srs = _SRS[(rand01(ids, seed, 54) * len(_SRS)).astype(int)]
    nch = 1 + (rand01(ids, seed, 55) > 0.7).astype(int)
    # 40-120 ms keeps rows small; payload size is a knob, not a semantic
    nfr = (srs * (0.04 + rand01(ids, seed, 56) * 0.08)).astype(int)
    lab = (rand01(ids, seed, 57) * len(_LABELS)).astype(int)
    mids, blobs, caps = [], [], []
    for k, i in enumerate(ids.tolist()):
        pcm = synth_pcm(i, seed, int(srs[k]), int(nfr[k]), int(nch[k]))
        blobs.append(wav_encode(pcm, int(srs[k])))
        mids.append(f"aud{i:08d}")
        caps.append(f"The sound of {_LABELS[lab[k]]} (#{i}).")
    return pa.table({
        "media_id": pa.array(mids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(srs, pa.int32()),
        "nchan": pa.array(nch.astype(np.int32), pa.int32()),
        "nframes": pa.array(nfr.astype(np.int32), pa.int32()),
        "fmt": pa.array(["wav"] * len(ids), pa.string()),
        "caption": pa.array(caps, pa.string()),
    }, schema=AUDIO_SCHEMA)


def ray_audio_table(n: int, seed: int = 42, parallelism: int = -1):
    """Distributed deterministic audio table (row i independent of
    batching); small batches — binary payload rows are wide."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        return synth_audio_rows(
            batch["id"].to_numpy(zero_copy_only=False), seed)

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0
                  else None)
    return ds.map_batches(build, batch_format="pyarrow", batch_size=512)


class DecodeAudio:
    """Actor-pool stage: WAV bytes -> flat int16 sample column + dims.

    ``ds.map_batches(DecodeAudio, concurrency=N, batch_size=256,
    batch_format="pyarrow")``.  Compressed formats raise
    :class:`~.images.AudioNotSupported` unless ``skip_undecodable``."""

    def __init__(self, skip_undecodable: bool = False):
        self.skip = skip_undecodable

    def __call__(self, t: pa.Table) -> pa.Table:
        from .images import AudioNotSupported
        mids, samples, srs, nchs, nfrs = [], [], [], [], []
        for mid, fmt, buf in zip(t["media_id"].to_pylist(),
                                 t["fmt"].to_pylist(),
                                 t["bytes"].to_pylist()):
            if fmt != "wav":
                if self.skip:
                    continue
                raise AudioNotSupported(
                    f"{fmt!r} decode not available in this environment")
            try:
                pcm, sr = wav_decode(buf)
            except Exception:
                if self.skip:
                    continue
                raise
            mids.append(mid)
            samples.append(pcm.reshape(-1))
            srs.append(sr)
            nchs.append(pcm.shape[1])
            nfrs.append(pcm.shape[0])
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
    """Actor-pool stage: WAV bytes -> per-row features (duration, RMS,
    peak, zero-crossing rate), vectorized per row over the PCM array."""

    def __init__(self, skip_undecodable: bool = True):
        self.skip = skip_undecodable

    def __call__(self, t: pa.Table) -> pa.Table:
        from .images import AudioNotSupported
        mids, dur, rms, peak, zcr = [], [], [], [], []
        for mid, fmt, buf in zip(t["media_id"].to_pylist(),
                                 t["fmt"].to_pylist(),
                                 t["bytes"].to_pylist()):
            if fmt != "wav":
                if self.skip:
                    continue
                raise AudioNotSupported(fmt)
            pcm, sr = wav_decode(buf)
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


def make_audio_verify_fn(seed: int = 42):
    """Per-row invariant stage (input_hint pattern for a lossless codec):
    decoded PCM must be BIT-EQUAL to the re-synthesized source, caption
    must match."""

    def verify(t: pa.Table) -> pa.Table:
        ok_pcm, ok_cap = [], []
        for row in t.to_pylist():
            i = int(row["media_id"][3:])
            pcm, sr = wav_decode(row["bytes"])
            ref = synth_pcm(i, seed, row["sr"], row["nframes"],
                            row["nchan"])
            ok_pcm.append(sr == row["sr"] and pcm.shape == ref.shape
                          and bool((pcm == ref).all()))
            lab = (rand01(np.array([np.int64(i)]), seed, 57)
                   * len(_LABELS)).astype(int)[0]
            ok_cap.append(row["caption"]
                          == f"The sound of {_LABELS[lab]} (#{i}).")
        return pa.table({
            "media_id": t["media_id"],
            "pcm_ok": pa.array(ok_pcm, pa.bool_()),
            "caption_ok": pa.array(ok_cap, pa.bool_()),
        })

    return verify
