"""Uniform parsing for FWN_* boolean/int env knobs.

All boolean knobs accept 1/0, true/false, yes/no, on/off — so
``FWN_INT8=0`` and ``FWN_NO_MASK=false`` DISABLE the flag (a plain
``bool(os.environ.get(...))`` would enable it, which for FWN_NO_MASK is
numerically wrong at sequence edges and for FWN_INT8 silently adds
quantization noise).
"""

from __future__ import annotations

import os

_TRUE = {"1", "true", "yes", "on"}
_FALSE = {"0", "false", "no", "off", ""}


def env_flag(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    val = raw.strip().lower()
    if val in _TRUE:
        return True
    if val in _FALSE:
        return False
    raise ValueError(
        f"{name}={raw!r}: expected a boolean (1/0, true/false, yes/no)")


def env_float(name: str, default: float, *, positive: bool = True) -> float:
    raw = os.environ.get(name)
    if raw is None:
        return default
    val = float(raw)
    if positive and val <= 0.0:
        raise ValueError(f"{name}={val}: must be positive")
    return val


def env_int(name: str, default: int, *, multiple_of: int = 1) -> int:
    """Integer env knob; validates divisibility at READ time so a bad
    tile size fails fast instead of crashing mid-run in kernel reshapes."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    val = int(raw)
    if val % multiple_of != 0 or val <= 0:
        raise ValueError(
            f"{name}={val}: must be a positive multiple of {multiple_of}")
    return val


# Single source of truth for the int8 pair-kernel mode (read by both
# ops/pallas_flow.py and models/flowavenet.py routing).  DEFAULT ON since
# round 3: quality-gated on real-speech-trained weights — corr(int8, bf16
# kernels) = 0.999962 (the bf16 kernels themselves measure 0.999963 vs
# XLA), and the mel-spectrogram correlation of synthesized audio against
# its conditioning is IDENTICAL (0.5774) across the XLA, bf16-kernel, and
# int8-kernel routes (tools/int8_quality_gate.py, docs/benchmarks.md).
# FWN_INT8=0 restores the quality-exact bf16 kernels.
INT8 = env_flag("FWN_INT8", default=True)
