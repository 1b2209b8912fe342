"""WAV I/O without librosa/soundfile: stdlib ``wave`` + numpy.

Replaces librosa.load / librosa.output.write_wav used by the reference
(preprocessing.py:50, synthesize.py:49).
"""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Load a PCM WAV as mono float32 in [-1, 1] plus its sample rate."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data, sr


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1, 1] as 16-bit PCM WAV."""
    data = np.asarray(data, dtype=np.float32).reshape(-1)
    # scale by 32768 to invert the read-side /32768 convention (librosa /
    # soundfile semantics), clamping the one unrepresentable code at +1.0
    pcm = np.clip(np.rint(data * 32768.0), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def resample(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling via scipy (librosa.load resamples on mismatch)."""
    if orig_sr == target_sr:
        return y
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(y, target_sr // g, orig_sr // g).astype(np.float32)


def load_audio(path: str, target_sr: int) -> np.ndarray:
    """librosa.load equivalent: mono float32 at ``target_sr``."""
    y, sr = read_wav(path)
    return resample(y, sr, target_sr)
