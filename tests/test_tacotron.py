"""Tacotron GTA adapter tests (reference prepare_tacotron_result.ipynb)."""

import numpy as np

from flowavenet_tpu.audio.tacotron import (adapt_gta_mel, align_audio,
                                           build_records)
from flowavenet_tpu.config import tiny
from flowavenet_tpu.data.records import FwRecordReader


def test_adapt_gta_mel_golden():
    mel = np.array([[-5.0, -4.0, 0.0, 4.0, 9.0]], np.float32)
    out = adapt_gta_mel(mel)
    np.testing.assert_allclose(out, [[0.0, 0.0, 0.5, 1.0, 1.0]])


def test_align_audio():
    a = np.ones(100, np.float32)
    out = align_audio(a, mel_frames=3, hop=64)
    assert len(out) == 192 and out[150] == 0.0
    out2 = align_audio(np.ones(300, np.float32), 3, 64)
    assert len(out2) == 192 and out2.min() == 1.0


def test_build_records(tmp_path):
    cfg = tiny()
    hop = cfg.audio.hop_size
    rng = np.random.RandomState(0)
    pairs = []
    for i in range(5):
        a = rng.randn(40 * hop).astype(np.float32)
        m = (rng.rand(40, cfg.model.num_mels) * 8 - 4).astype(np.float32)
        ap, mp = tmp_path / f"a{i}.npy", tmp_path / f"m{i}.npy"
        np.save(ap, a), np.save(mp, m)
        pairs.append((str(ap), str(mp), 0))
    tr, te = build_records(pairs, str(tmp_path / "out"), cfg)
    r = FwRecordReader(tr)
    a, m, _ = r.read(0)
    assert len(a) == m.shape[0] * hop
    assert 0.0 <= m.min() and m.max() <= 1.0
    r.close()
