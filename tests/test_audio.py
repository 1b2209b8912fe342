"""Audio frontend tests (SURVEY §4 item 4): STFT vs scipy, mel filterbank
invariants, normalization golden values, pad/trim alignment contract, WAV IO.
"""

import numpy as np
import pytest

from flowavenet_tpu.audio.mel import (hann_window, hz_to_mel, mel_filterbank,
                                      mel_spectrogram, mel_spectrogram_jax,
                                      mel_to_hz, normalize_mel, process_wav,
                                      stft_power)
from flowavenet_tpu.audio.wavio import read_wav, resample, write_wav
from flowavenet_tpu.config import AudioConfig

CFG = AudioConfig()


def test_hann_window_periodic():
    # periodic (fftbins) Hann: w[0]=0, no symmetric endpoint
    w = hann_window(8)
    np.testing.assert_allclose(w[0], 0.0, atol=1e-7)
    assert w[4] == pytest.approx(1.0)
    assert len(w) == 8 and w[-1] != w[0]


def test_mel_scale_roundtrip():
    f = np.array([0.0, 125.0, 999.0, 1000.0, 4000.0, 7600.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    # slaney scale: linear below 1 kHz
    np.testing.assert_allclose(hz_to_mel(500.0), 500.0 / (200.0 / 3.0))


def test_mel_filterbank_invariants():
    fb = mel_filterbank(22050, 1024, 80, 125.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; triangles overlap neighbours
    assert (fb.sum(axis=1) > 0).all()
    # no energy below fmin or above fmax bins
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs < 120.0].sum() == 0
    assert fb[:, freqs > 7700.0].sum() == 0
    # slaney normalization: peak amplitude ~ 2/bandwidth, so wider (higher)
    # filters have smaller peaks
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_stft_matches_scipy():
    from scipy.signal import stft as sp_stft
    rng = np.random.RandomState(0)
    y = rng.randn(4096).astype(np.float32)
    n_fft, hop = 512, 128
    S = stft_power(y, n_fft, hop)
    # scipy with matching params: periodic hann, overlap = n_fft - hop,
    # no boundary extension; compare interior frames (centering differs at
    # the edges: librosa reflect-pads, scipy zero-pads the boundary)
    f, t, Z = sp_stft(y, window="hann", nperseg=n_fft, noverlap=n_fft - hop,
                      boundary="zeros", padded=True, return_onesided=True)
    # scipy normalizes by window.sum(); undo
    win = hann_window(n_fft)
    Zp = (np.abs(Z) * win.sum()) ** 2
    interior = slice(3, S.shape[0] - 3)
    np.testing.assert_allclose(S[interior], Zp.T[interior], rtol=2e-2,
                               atol=1e-3)


def test_normalize_mel_golden():
    # exact formula: 20*log10(max(1e-4, m)) - 20, then (x+100)/100 clipped
    m = np.array([[1e-6, 1e-4, 1.0, 10.0]], np.float32)
    out = normalize_mel(m, CFG)
    expected = np.clip(
        (20 * np.log10(np.maximum(1e-4, m)) - 20 + 100) / 100, 0, 1)
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    assert out[0, 0] == 0.0  # floor clamps to 0


def test_process_wav_alignment():
    rng = np.random.RandomState(1)
    for n in [5000, 255, 256, 8191, 22050]:
        wav = rng.randn(n).astype(np.float32)
        audio, mel = process_wav(wav, CFG)
        assert len(audio) == mel.shape[0] * CFG.hop_size
        assert mel.shape[1] == CFG.num_mels
        assert np.abs(audio).max() <= CFG.rescaling_max + 1e-4
        # frame count matches librosa centered stft: 1 + n//hop
        assert mel.shape[0] == 1 + n // CFG.hop_size


def test_mel_jax_matches_numpy():
    rng = np.random.RandomState(2)
    wav = rng.randn(2, 4096).astype(np.float32)
    ref = np.stack([normalize_mel(mel_spectrogram(w, CFG), CFG)
                    for w in wav])
    out = np.asarray(mel_spectrogram_jax(wav, CFG))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    y = np.clip(rng.randn(1000) * 0.3, -1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, y, 22050)
    y2, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(y2, y, atol=1.0 / 32767)


def test_resample_identity_and_rate():
    rng = np.random.RandomState(4)
    y = rng.randn(8000).astype(np.float32)
    assert resample(y, 22050, 22050) is y
    y2 = resample(y, 16000, 8000)
    assert abs(len(y2) - 4000) <= 1
