"""Units for the stdlib WAV codec (llm/wav.py) and the real audio
path through the multimodal layer."""

from __future__ import annotations

import math

import pytest

from pos_api_pipeline_spark.llm.wav import (
    audio_features,
    decode_wav,
    encode_wav,
    is_wav,
    resample_nearest,
)


def _sine(freq=440.0, rate=8000, duration=0.05, amp=0.5):
    n = int(rate * duration)
    return [amp * math.sin(2 * math.pi * freq * i / rate) for i in range(n)]


def test_roundtrip_bit_faithful_within_quantization():
    samples = _sine()
    payload = encode_wav(samples, 8000)
    assert is_wav(payload)
    rate, n_ch, decoded = decode_wav(payload)
    assert (rate, n_ch, len(decoded)) == (8000, 1, len(samples))
    # 16-bit quantization error bound: half an LSB of 1/32768.
    assert max(abs(a - b) for a, b in zip(samples, decoded)) <= 1.0 / 32768


def test_encode_decode_stereo_interleaved():
    left = [0.25] * 10
    right = [-0.25] * 10
    inter = [v for pair in zip(left, right) for v in pair]
    rate, n_ch, decoded = decode_wav(encode_wav(inter, 16000, n_channels=2))
    assert n_ch == 2
    assert all(s > 0 for s in decoded[0::2])
    assert all(s < 0 for s in decoded[1::2])


def test_audio_features_hand_computed():
    # 100 Hz sine at 8 kHz for 1 s: duration 1.0, rms ≈ amp/sqrt(2),
    # zcr ≈ 2 crossings/cycle * 100 cycles / 8000 pairs = 0.025.
    payload = encode_wav(_sine(freq=100.0, rate=8000, duration=1.0), 8000)
    a = audio_features(payload)
    assert abs(a["duration_s"] - 1.0) < 1e-9
    assert abs(a["rms"] - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(a["peak"] - 0.5) < 1e-3
    assert abs(a["zcr"] - 0.025) < 0.005


def test_decode_rejects_non_wav_and_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    # 8-bit PCM (bits=16 is the supported format) → explicit stub
    # boundary, not silent garbage.
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        decode_wav(payload)


def test_resample_nearest_changes_rate_keeps_duration():
    payload = encode_wav(_sine(rate=8000, duration=0.1), 8000)
    out = resample_nearest(payload, 4000)
    rate, n_ch, samples = decode_wav(out)
    assert rate == 4000
    assert abs(len(samples) / rate - 0.1) < 0.01
    a = audio_features(out)
    assert abs(a["rms"] - 0.5 / math.sqrt(2)) < 0.01


def test_extract_features_real_wav_path(spark):
    from pos_api_pipeline_spark.llm.multimodal import (
        extract_features,
        synthetic_wav_assets,
    )

    assets = synthetic_wav_assets(spark, n=4, sample_rate=8000,
                                  duration_s=0.05)
    rows = {r.asset_id: r for r in extract_features(assets, n_dims=4).collect()}
    assert len(rows) == 4
    for k, r in rows.items():
        dur, rms, peak, zcr = r.feature
        assert abs(dur - 0.05) < 1e-9
        assert abs(rms - 0.5 / math.sqrt(2)) < 0.02
        assert abs(peak - 0.5) < 0.02
        # Higher-frequency assets cross zero more often.
    zcrs = [rows[k].feature[3] for k in sorted(rows)]
    assert zcrs == sorted(zcrs)


def test_resample_audio_operator_updates_meta(spark):
    from pos_api_pipeline_spark.llm.multimodal import (
        resample_audio,
        synthetic_wav_assets,
    )

    assets = synthetic_wav_assets(spark, n=3, sample_rate=8000,
                                  duration_s=0.05)
    out = resample_audio(assets, 4000).collect()
    assert len(out) == 3
    for r in out:
        assert r.meta.sample_rate == 4000
        assert abs(r.meta.duration_ms - 50) <= 1
        rate, _, samples = decode_wav(bytes(r.payload))
        assert rate == 4000


def test_spectral_features_pure_tones(spark):
    """A pure sine's spectral centroid must sit at its frequency, and
    tone flatness must be far below noise flatness."""
    from pos_api_pipeline_spark.llm.multimodal import (
        audio_spectral_features,
        synthetic_wav_assets,
    )

    # asset k is a 220*(k+1) Hz tone at 8 kHz; 0.2 s → ≥1600 samples
    assets = synthetic_wav_assets(spark, n=3, sample_rate=8000,
                                  duration_s=0.2)
    out = {r.asset_id: r for r in audio_spectral_features(assets).collect()}
    assert set(out) == {0, 1, 2}
    for k in range(3):
        f = 220.0 * (k + 1)
        r = out[k]
        assert r.sample_rate == 8000
        # centroid within one FFT bin (8000/1024 ≈ 7.8 Hz) + leakage
        assert abs(r.centroid_hz - f) < 40, (k, r.centroid_hz)
        assert abs(r.rolloff_hz - f) < 40
        # pure tone: concentrated spectrum → low flatness, tight bandwidth
        assert r.flatness < 0.5
        assert r.bandwidth_hz < 400
    # Higher tone ⇒ higher centroid, monotonic.
    assert out[0].centroid_hz < out[1].centroid_hz < out[2].centroid_hz
