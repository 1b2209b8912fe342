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


# Single source of truth for the experimental int8 filter|gate conv mode
# (read by both ops/pallas_flow.py and models/flowavenet.py routing).
INT8 = env_flag("FWN_INT8")
