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
