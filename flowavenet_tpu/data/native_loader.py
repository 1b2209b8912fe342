"""ctypes binding for the native C++ FwRecords loader (native/fwrec_loader.cc).

Drop-in alternative to the Python ``CropDataset`` with the batch assembly and
prefetching in C++ off the GIL.  Same counter-based deterministic-resume
contract (per-step reproducible batches); the PRNG differs (splitmix64 vs
numpy Philox) so streams are not bit-identical across the two loaders.

The shared library is built on demand with ``make -C native`` (g++ is part
of the baked toolchain); set ``FLOWAVENET_NO_NATIVE=1`` to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfwrec.so")

_lib: Optional[ctypes.CDLL] = None


def _build_lib() -> str:
    if not os.path.exists(_LIB_PATH):
        if not os.path.isdir(_NATIVE_DIR):
            raise RuntimeError(
                f"native sources not found at {_NATIVE_DIR} — the C++ "
                "loader needs a source checkout (pip install -e); use the "
                "pure-python CropDataset otherwise")
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("FLOWAVENET_NO_NATIVE"):
        raise RuntimeError("native loader disabled via FLOWAVENET_NO_NATIVE")
    lib = ctypes.CDLL(_build_lib())
    lib.fwrec_open.restype = ctypes.c_void_p
    lib.fwrec_open.argtypes = [ctypes.c_char_p]
    lib.fwrec_count.restype = ctypes.c_int64
    lib.fwrec_count.argtypes = [ctypes.c_void_p]
    lib.fwrec_mel_bins.restype = ctypes.c_int64
    lib.fwrec_mel_bins.argtypes = [ctypes.c_void_p]
    lib.fwrec_record_meta.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.fwrec_batch.restype = ctypes.c_int64
    lib.fwrec_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p, f32p, i32p]
    lib.fwrec_prefetch_start.restype = ctypes.c_int
    lib.fwrec_prefetch_start.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fwrec_prefetch_next.restype = ctypes.c_int64
    lib.fwrec_prefetch_next.argtypes = [ctypes.c_void_p, f32p, f32p, i32p]
    lib.fwrec_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeCropDataset:
    """C++-backed equivalent of data.dataset.CropDataset."""

    def __init__(self, record_path: str, *, hop_size: int,
                 max_time_steps: int, batch_size: int, seed: int = 42,
                 with_speaker: bool = False):
        self._lib = load_library()
        self._h = self._lib.fwrec_open(record_path.encode())
        if not self._h:
            raise ValueError(f"cannot open FwRecords file {record_path}")
        self.hop = hop_size
        self.mel_crop = max_time_steps // hop_size
        self.time_crop = self.mel_crop * hop_size
        self.batch_size = batch_size
        self.seed = seed
        self.with_speaker = with_speaker
        self.n_records = int(self._lib.fwrec_count(self._h))
        self.mel_bins = int(self._lib.fwrec_mel_bins(self._h))

    def __len__(self) -> int:
        return self.n_records

    def record_meta(self, i: int) -> tuple[int, int, int, int]:
        out = np.zeros(4, np.int64)
        self._lib.fwrec_record_meta(self._h, i, out)
        return tuple(int(x) for x in out)

    def _alloc(self):
        return (np.empty((self.batch_size, self.time_crop, 1), np.float32),
                np.empty((self.batch_size, self.mel_crop, self.mel_bins),
                         np.float32),
                np.empty((self.batch_size,), np.int32))

    @staticmethod
    def _check_rc(rc: int, hop: int) -> None:
        if rc < 0:
            raise ValueError(
                f"record {~rc}: audio shorter than mel_frames * hop ({hop}); "
                f"audio/mel misaligned FwRecords file")

    def batch_at(self, step: int) -> dict:
        audio, mel, sid = self._alloc()
        rc = self._lib.fwrec_batch(self._h, self.seed, step, self.batch_size,
                                   self.mel_crop, self.hop,
                                   audio.reshape(-1), mel.reshape(-1), sid)
        self._check_rc(rc, self.hop)
        out = {"audio": audio, "mel": mel}
        if self.with_speaker:
            out["speaker"] = sid
        return out

    def iterate(self, start_step: int = 0, prefetch: int = 3
                ) -> Iterator[dict]:
        rc = self._lib.fwrec_prefetch_start(self._h, self.seed, start_step,
                                            self.batch_size, self.mel_crop,
                                            self.hop, prefetch)
        self._check_rc(rc, self.hop)
        while True:
            audio, mel, sid = self._alloc()
            step = self._lib.fwrec_prefetch_next(
                self._h, audio.reshape(-1), mel.reshape(-1), sid)
            if step < 0:
                return
            out = {"audio": audio, "mel": mel}
            if self.with_speaker:
                out["speaker"] = sid
            yield out

    def close(self) -> None:
        if self._h:
            self._lib.fwrec_close(self._h)
            self._h = None
