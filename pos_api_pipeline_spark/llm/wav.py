"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal layer.

The container has no audio libraries, but PCM WAV needs none: the
RIFF container is a length-prefixed chunk list and 16-bit PCM is
``struct``-decodable. This makes the audio path of
``llm/multimodal.py`` REAL (decode → features → re-encode), the same
way ``llm/png.py`` made the image path real — the stub boundary
retreats to compressed codecs (MP3/OGG/FLAC), where a real decoder
library would plug in.

Only the codec lives here; all distribution (Arrow batching,
mapInPandas, partition sizing) stays in ``multimodal.py``. Parsing is
driver/executor-side Python over small byte payloads — at 100 TB the
payloads stream through ``mapInPandas`` one Arrow batch at a time, so
peak memory is one batch regardless of corpus size.
"""

from __future__ import annotations

import math
import struct

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def is_wav(payload: bytes | None) -> bool:
    """RIFF/WAVE magic check (cheap reject before full parse)."""
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == _RIFF
        and payload[8:12] == _WAVE
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """Parse a PCM WAV payload → (sample_rate, n_channels, samples).

    Samples are interleaved floats in [-1, 1). Supports the format
    this codec writes (16-bit signed little-endian PCM, fmt tag 1) —
    anything else raises NotImplementedError, the documented plug-in
    point for a real audio library.
    """
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_channels, sample_rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM supported (got tag={tag}, bits={bits}); "
            "plug an audio codec library here for compressed formats"
        )
    n = len(data) // 2
    ints = struct.unpack(f"<{n}h", data[: n * 2])
    return sample_rate, n_channels, [s / 32768.0 for s in ints]


def encode_wav(
    samples: list[float], sample_rate: int, n_channels: int = 1
) -> bytes:
    """Serialize interleaved [-1, 1) floats as 16-bit PCM WAV."""
    ints = [
        max(-32768, min(32767, int(round(s * 32768.0)))) for s in samples
    ]
    data = struct.pack(f"<{len(ints)}h", *ints)
    fmt = struct.pack(
        "<HHIIHH",
        1,
        n_channels,
        sample_rate,
        sample_rate * n_channels * 2,
        n_channels * 2,
        16,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF + struct.pack("<I", 4 + len(chunks)) + _WAVE + chunks


def audio_features(payload: bytes) -> dict[str, float]:
    """Hand-computable audio statistics of a PCM WAV payload:
    duration_s, rms, peak (absolute), zero-crossing rate (fraction of
    adjacent same-channel pairs changing sign — pitch proxy).
    """
    sample_rate, n_channels, samples = decode_wav(payload)
    frames = len(samples) // max(n_channels, 1)
    if not samples:
        return {
            "duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0,
        }
    rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    peak = max(abs(s) for s in samples)
    crossings = pairs = 0
    for ch in range(n_channels):
        chan = samples[ch::n_channels]
        for a, b in zip(chan, chan[1:]):
            pairs += 1
            if (a >= 0) != (b >= 0):
                crossings += 1
    return {
        "duration_s": frames / sample_rate,
        "rms": rms,
        "peak": peak,
        "zcr": crossings / pairs if pairs else 0.0,
    }


def resample_nearest(
    payload: bytes, target_rate: int
) -> bytes:
    """Nearest-neighbor resample to ``target_rate`` (the audio analog
    of the PNG resize path): real decode → index remap → real
    re-encode. Fidelity is nearest-sample (no filtering) — enough for
    feature pipelines; swap in a windowed-sinc resampler for audio
    delivery."""
    sample_rate, n_channels, samples = decode_wav(payload)
    frames = len(samples) // max(n_channels, 1)
    out_frames = max(1, int(round(frames * target_rate / sample_rate)))
    out: list[float] = []
    for i in range(out_frames):
        src = min(frames - 1, int(i * sample_rate / target_rate))
        out.extend(samples[src * n_channels : (src + 1) * n_channels])
    return encode_wav(out, target_rate, n_channels)


def spectral_features(
    payload: bytes, n_fft: int = 1024
) -> dict[str, float]:
    """Frequency-domain features of a PCM WAV payload via a real FFT
    over the first channel: spectral centroid (Hz — brightness),
    rolloff (Hz below which 85% of energy sits), bandwidth (Hz,
    centroid-weighted spread), and flatness (geometric/arithmetic
    mean ratio — tonality vs noise). The standard cheap audio-quality
    features a corpus pipeline computes before any model sees the
    clip.

    numpy only (rfft) — deterministic for a given payload, so
    unit-assertable against pure sine fixtures. Power spectrum under
    a Hann window, averaged across non-overlapping ``n_fft`` frames —
    rectangular-window magnitude spectra leak enough sidelobe energy
    to drag a pure tone's centroid hundreds of Hz off its frequency.
    O(n log n) per clip.
    """
    import numpy as np

    sample_rate, n_channels, samples = decode_wav(payload)
    mono = np.asarray(samples[::max(n_channels, 1)], dtype=np.float64)
    if mono.size < 2:
        return {
            "sample_rate": float(sample_rate),
            "centroid_hz": 0.0, "rolloff_hz": 0.0,
            "bandwidth_hz": 0.0, "flatness": 0.0,
        }
    n = min(n_fft, mono.size)
    n_frames = mono.size // n
    window = np.hanning(n)
    spec = np.zeros(n // 2 + 1)
    for i in range(max(n_frames, 1)):
        frame = mono[i * n:(i + 1) * n]
        if frame.size < n:
            frame = np.pad(frame, (0, n - frame.size))
        spec += np.abs(np.fft.rfft(frame * window)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = spec.sum()
    if total <= 0:
        return {
            "sample_rate": float(sample_rate),
            "centroid_hz": 0.0, "rolloff_hz": 0.0,
            "bandwidth_hz": 0.0, "flatness": 0.0,
        }
    p = spec / total
    centroid = float((freqs * p).sum())
    cum = np.cumsum(p)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85))])
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * p).sum()))
    pos = spec[spec > 0]
    flatness = float(
        np.exp(np.log(pos).mean()) / pos.mean()
    ) if pos.size else 0.0
    return {
        "sample_rate": float(sample_rate),
        "centroid_hz": centroid,
        "rolloff_hz": rolloff,
        "bandwidth_hz": bandwidth,
        "flatness": flatness,
    }
