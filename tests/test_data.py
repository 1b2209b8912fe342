"""Data layer tests: record roundtrip, crop reads, split parity vs sklearn,
dataset determinism + short-clip fix, preprocessing CLI end-to-end.
"""

import os

import numpy as np
import pytest

from flowavenet_tpu.audio.wavio import write_wav
from flowavenet_tpu.config import AudioConfig, Config, DataConfig, tiny
from flowavenet_tpu.data.dataset import CropDataset
from flowavenet_tpu.data.records import (FwRecordReader, FwRecordWriter,
                                         train_test_split_indices)


def _write_records(path, n=5, mel_bins=4, hop=4, frames=None, seed=0):
    rng = np.random.RandomState(seed)
    items = []
    with FwRecordWriter(str(path)) as w:
        for i in range(n):
            f = frames[i] if frames else 10 + i
            mel = rng.rand(f, mel_bins).astype(np.float32)
            audio = rng.randn(f * hop).astype(np.float32)
            w.write(audio, mel, speaker_id=i % 3)
            items.append((audio, mel, i % 3))
    return items


def test_record_roundtrip(tmp_path):
    p = tmp_path / "a.fwrec"
    items = _write_records(p)
    r = FwRecordReader(str(p))
    assert len(r) == 5
    for i, (audio, mel, sid) in enumerate(items):
        a, m, s = r.read(i)
        np.testing.assert_array_equal(a, audio)
        np.testing.assert_array_equal(m, mel)
        assert s == sid
    r.close()


def test_record_crop_read(tmp_path):
    p = tmp_path / "a.fwrec"
    items = _write_records(p, hop=4)
    r = FwRecordReader(str(p))
    audio, mel, _ = items[2]
    a, m, s = r.read_crop(2, mel_start=3, mel_frames=5, hop=4)
    np.testing.assert_array_equal(m, mel[3:8])
    np.testing.assert_array_equal(a, audio[12:32])
    with pytest.raises(IndexError):
        r.read_crop(2, mel_start=10, mel_frames=5, hop=4)
    r.close()


def test_misaligned_record_crop_rejected(tmp_path):
    """A record whose audio is shorter than mel_frames*hop (written by a
    pipeline bypassing the alignment contract) must fail loudly instead of
    silently reading the next record's bytes as audio."""
    p = tmp_path / "a.fwrec"
    with FwRecordWriter(str(p)) as w:
        mel = np.random.RandomState(0).rand(10, 4).astype(np.float32)
        w.write(np.zeros(12, np.float32), mel)  # needs 10*4=40 samples
        w.write(np.zeros(40, np.float32), mel)
    r = FwRecordReader(str(p))
    with pytest.raises(ValueError, match="misaligned"):
        r.read_crop(0, mel_start=2, mel_frames=5, hop=4)
    # the aligned record still reads fine
    r.read_crop(1, mel_start=2, mel_frames=5, hop=4)
    r.close()


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.fwrec"
    p.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
    np.save(str(tmp_path / "bad.fwidx.npy"), np.array([8], np.uint64))
    with pytest.raises(ValueError, match="bad magic"):
        FwRecordReader(str(p))


def test_split_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.model_selection")
    n, test_size, seed = 137, 10, 123
    train, test = train_test_split_indices(n, test_size, seed)
    sk_train, sk_test = sklearn.train_test_split(
        np.arange(n), test_size=test_size, random_state=seed)
    np.testing.assert_array_equal(np.sort(test), np.sort(sk_test))
    np.testing.assert_array_equal(np.sort(train), np.sort(sk_train))


def test_dataset_determinism_and_shapes(tmp_path):
    p = tmp_path / "t.fwrec"
    _write_records(p, n=6, mel_bins=4, hop=4, frames=[40] * 6)
    ds = CropDataset(str(p), hop_size=4, max_time_steps=32, batch_size=3,
                     seed=7, with_speaker=True)
    b1 = ds.batch_at(5)
    b2 = ds.batch_at(5)
    np.testing.assert_array_equal(b1["audio"], b2["audio"])
    assert b1["audio"].shape == (3, 32, 1)
    assert b1["mel"].shape == (3, 8, 4)
    assert b1["speaker"].shape == (3,)
    b3 = ds.batch_at(6)
    assert not np.array_equal(b1["audio"], b3["audio"])


def test_dataset_crop_alignment(tmp_path):
    # audio window must equal mel window * hop: encode position in values
    p = tmp_path / "t.fwrec"
    hop, frames = 4, 50
    mel = np.arange(frames, dtype=np.float32)[:, None] * np.ones((1, 2))
    audio = np.repeat(np.arange(frames, dtype=np.float32), hop)
    with FwRecordWriter(str(p)) as w:
        w.write(audio, mel)
    ds = CropDataset(str(p), hop_size=hop, max_time_steps=16, batch_size=1)
    for step in range(20):
        b = ds.batch_at(step)
        start_frame = int(b["mel"][0, 0, 0])
        np.testing.assert_array_equal(
            b["audio"][0, :, 0],
            np.repeat(np.arange(start_frame, start_frame + 4,
                                dtype=np.float32), hop))


def test_dataset_short_clip_padded(tmp_path):
    # reference would crash here (dataset.py:73); we zero-pad
    p = tmp_path / "s.fwrec"
    _write_records(p, n=2, mel_bins=4, hop=4, frames=[3, 3])
    ds = CropDataset(str(p), hop_size=4, max_time_steps=32, batch_size=2)
    b = ds.batch_at(0)
    assert b["mel"].shape == (2, 8, 4)
    assert np.all(b["mel"][:, 3:] == 0)
    assert np.all(b["audio"][:, 12:] == 0)


def test_dataset_prefetch_iterator(tmp_path):
    p = tmp_path / "t.fwrec"
    _write_records(p, n=4, mel_bins=4, hop=4, frames=[40] * 4)
    ds = CropDataset(str(p), hop_size=4, max_time_steps=16, batch_size=2)
    it = ds.iterate(start_step=0)
    batches = [next(it) for _ in range(3)]
    # matches direct batch_at stream (deterministic resume contract)
    for i, b in enumerate(batches):
        np.testing.assert_array_equal(b["audio"], ds.batch_at(i)["audio"])


def test_preprocessing_end_to_end(tmp_path):
    # synthetic mini-corpus in the reference's single-speaker layout
    from flowavenet_tpu.audio.preprocessing import preprocess
    cfg = Config(audio=AudioConfig(sample_rate=8000, n_fft=256, hop_size=64,
                                   fmin=50, fmax=3800),
                 data=DataConfig(test_size=2))
    book = tmp_path / "corpus" / "book1"
    (book / "wavs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(6):
        name = f"utt{i:03d}"
        wav = 0.4 * np.sin(np.linspace(0, 50 + i * 10, 4000 + i * 333)
                           ).astype(np.float32)
        wav += 0.05 * rng.randn(len(wav)).astype(np.float32)
        write_wav(str(book / "wavs" / f"{name}.wav"), wav, 8000)
        lines.append(f"{name}|x|hello world {i}")
    (book / "metadata.csv").write_text("\n".join(lines))

    out = tmp_path / "out"
    metadata = preprocess(str(tmp_path / "corpus"), str(out), cfg,
                          num_workers=2)
    assert len(metadata) == 6
    assert (out / "train.txt").exists()
    assert (out / "train.fwrec").exists() and (out / "test.fwrec").exists()

    train = FwRecordReader(str(out / "train.fwrec"))
    test = FwRecordReader(str(out / "test.fwrec"))
    # tiny-corpus cap: test = max(1, n//5) = 1, train keeps the rest
    assert len(train) == 5 and len(test) == 1
    a, m, sid = train.read(0)
    assert len(a) == m.shape[0] * 64       # alignment contract
    assert m.shape[1] == cfg.audio.num_mels
    assert 0.0 <= m.min() and m.max() <= 1.0
    # loadable by the training dataset
    ds = CropDataset(str(out / "train.fwrec"), hop_size=64,
                     max_time_steps=1024, batch_size=2)
    b = ds.batch_at(0)
    assert b["audio"].shape == (2, 1024, 1)


def test_preprocessing_multi_speaker_end_to_end(tmp_path):
    """Multi-speaker corpus layout (in_dir/speaker/book) with gin enabled:
    speakers.txt written, speaker ids propagated into records."""
    from flowavenet_tpu.audio.preprocessing import preprocess
    from flowavenet_tpu.config import AudioConfig, Config, DataConfig, ModelConfig

    cfg = Config(audio=AudioConfig(sample_rate=8000, n_fft=256, hop_size=64,
                                   fmin=50, fmax=3800),
                 model=ModelConfig(gin_channels=16, n_speakers=2),
                 data=DataConfig(test_size=1))
    rng = np.random.RandomState(0)
    for s, speaker in enumerate(["alice", "bob"]):
        book = tmp_path / "corpus" / speaker / "book1"
        (book / "wavs").mkdir(parents=True)
        lines = []
        for i in range(3):
            wav = 0.3 * np.sin(np.linspace(0, 60 + s * 20, 4000)
                               ).astype(np.float32)
            write_wav(str(book / "wavs" / f"u{i}.wav"), wav, 8000)
            lines.append(f"u{i}|x|text")
        (book / "metadata.csv").write_text("\n".join(lines))

    out = tmp_path / "out"
    preprocess(str(tmp_path / "corpus"), str(out), cfg, num_workers=1)
    speakers = (out / "speakers.txt").read_text().strip().split("\n")
    assert speakers == ["alice - 0", "bob - 1"]
    r = FwRecordReader(str(out / "train.fwrec"))
    sids = {r.read(i)[2] for i in range(len(r))}
    assert sids <= {0, 1} and len(sids) == 2
    # trainable with speakers through CropDataset
    ds = CropDataset(str(out / "train.fwrec"), hop_size=64,
                     max_time_steps=512, batch_size=4, with_speaker=True)
    b = ds.batch_at(0)
    assert set(np.unique(b["speaker"])) <= {0, 1}
