"""Native C++ loader tests: build, open, crop alignment, determinism,
short-clip padding, prefetch stream == synchronous stream."""

import numpy as np
import pytest

from flowavenet_tpu.data.records import FwRecordWriter

native = pytest.importorskip("flowavenet_tpu.data.native_loader")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build unavailable: {e}")


def _write(path, frames, hop=4, bins=3):
    with FwRecordWriter(str(path)) as w:
        for i, f in enumerate(frames):
            mel = np.arange(f, dtype=np.float32)[:, None] * np.ones((1, bins))
            audio = np.repeat(np.arange(f, dtype=np.float32), hop)
            w.write(audio, mel, speaker_id=i)


def test_open_and_meta(lib, tmp_path):
    p = tmp_path / "a.fwrec"
    _write(p, [10, 20, 30])
    ds = native.NativeCropDataset(str(p), hop_size=4, max_time_steps=16,
                                  batch_size=2)
    assert len(ds) == 3 and ds.mel_bins == 3
    assert ds.record_meta(1) == (80, 20, 3, 1)
    ds.close()


def test_misaligned_record_rejected(lib, tmp_path):
    """audio_len < mel_frames*hop must error loudly (both the synchronous
    batch path and the prefetch path), mirroring records.read_crop."""
    p = tmp_path / "bad_align.fwrec"
    with FwRecordWriter(str(p)) as w:
        w.write(np.zeros(40, np.float32),
                np.zeros((10, 3), np.float32))      # aligned (hop 4)
        w.write(np.zeros(12, np.float32),
                np.zeros((10, 3), np.float32))      # 12 < 10*4
    ds = native.NativeCropDataset(str(p), hop_size=4, max_time_steps=16,
                                  batch_size=2)
    with pytest.raises(ValueError, match="record 1.*misaligned"):
        ds.batch_at(0)
    with pytest.raises(ValueError, match="record 1.*misaligned"):
        next(ds.iterate())
    ds.close()


def test_open_bad_file(lib, tmp_path):
    p = tmp_path / "bad.fwrec"
    p.write_bytes(b"NOTMAGIC123456789")
    with pytest.raises(ValueError):
        native.NativeCropDataset(str(p), hop_size=4, max_time_steps=16,
                                 batch_size=1)


def test_determinism_and_alignment(lib, tmp_path):
    p = tmp_path / "a.fwrec"
    _write(p, [50, 60, 70])
    ds = native.NativeCropDataset(str(p), hop_size=4, max_time_steps=16,
                                  batch_size=4, seed=9, with_speaker=True)
    b1, b2 = ds.batch_at(3), ds.batch_at(3)
    np.testing.assert_array_equal(b1["audio"], b2["audio"])
    np.testing.assert_array_equal(b1["mel"], b2["mel"])
    assert not np.array_equal(b1["audio"], ds.batch_at(4)["audio"])
    # alignment: audio window == repeat(mel frame ids, hop)
    for b in range(4):
        start = b1["mel"][b, 0, 0]
        expect = np.repeat(np.arange(start, start + 4, dtype=np.float32), 4)
        np.testing.assert_array_equal(b1["audio"][b, :, 0], expect)
    ds.close()


def test_short_clip_padded(lib, tmp_path):
    p = tmp_path / "s.fwrec"
    _write(p, [2, 3])
    ds = native.NativeCropDataset(str(p), hop_size=4, max_time_steps=32,
                                  batch_size=4)
    b = ds.batch_at(0)
    assert b["mel"].shape == (4, 8, 3)
    assert np.all(b["mel"][:, 3:] == 0)
    assert np.all(b["audio"][:, 12:] == 0)
    ds.close()


def test_prefetch_matches_sync(lib, tmp_path):
    p = tmp_path / "a.fwrec"
    _write(p, [50, 60, 70, 80])
    ds = native.NativeCropDataset(str(p), hop_size=4, max_time_steps=16,
                                  batch_size=3, seed=2)
    it = ds.iterate(start_step=5)
    for step in range(5, 10):
        b = next(it)
        ref = ds.batch_at(step)
        np.testing.assert_array_equal(b["audio"], ref["audio"])
        np.testing.assert_array_equal(b["mel"], ref["mel"])
    ds.close()


def test_speaker_ids(lib, tmp_path):
    p = tmp_path / "a.fwrec"
    _write(p, [50, 50, 50])
    ds = native.NativeCropDataset(str(p), hop_size=4, max_time_steps=16,
                                  batch_size=8, seed=1, with_speaker=True)
    b = ds.batch_at(0)
    assert set(np.unique(b["speaker"])) <= {0, 1, 2}
    ds.close()
