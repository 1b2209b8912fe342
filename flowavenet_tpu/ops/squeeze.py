"""Squeeze / unsqueeze: trade time resolution for channels.

Bit-exact layout parity with the reference (model.py:224-239, 259-277):
output channel ``2*c + p`` takes input ``(t = 2*t2 + p, c)`` — i.e. reshape
``[B,T,C] -> [B,T/2,2,C]``, transpose to ``[B,T/2,C,2]``, flatten.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def squeeze(x):
    """[B, T, C] -> [B, T//2, 2C] with the reference's 2c+p channel layout."""
    b, t, c = x.shape
    x = x.reshape(b, t // 2, 2, c)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(b, t // 2, 2 * c)


def unsqueeze(x):
    """Inverse of :func:`squeeze` (model.py:259-262)."""
    b, t, c2 = x.shape
    x = x.reshape(b, t, c2 // 2, 2)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(b, t * 2, c2 // 2)


def squeeze_n(x, n: int):
    for _ in range(n):
        x = squeeze(x)
    return x


def squeeze_to_level(x, k: int):
    """``squeeze_n(x, k)`` computed as ONE gather instead of k chained
    transposes.

    The composed reference layout is closed-form: level-k channel
    ``2**k * c + bitrev_k(delta)`` takes input ``(t = 2**k * t_k + delta,
    c)`` — each squeeze peels the current LSB of the time offset into the
    channel MSBs (model.py:224-228 applied k times; equality is covered by
    tests/test_primitives.py).  The reverse pass uses this to build each
    block's conditioning directly from the upsampled mel: the chained
    squeeze-down/unsqueeze-up pyramid cost ~16 full-tensor transposes
    (~90 ms at b96 x 4 s synthesis, per the profiler trace); this is one
    copy per block.
    """
    if k == 0:
        return x
    b, t, c = x.shape
    p = 1 << k
    # Factor the time offset into k bit-dims (axis 2 = MSB ... axis k+1 =
    # LSB) and express the bit reversal as ONE transpose — a gather here
    # lowers much worse on TPU.  Target channel order (major to minor):
    # m, p1(=LSB), p2, ..., pk.
    v = x.reshape((b, t // p) + (2,) * k + (c,))
    perm = (0, 1, k + 2) + tuple(range(k + 1, 1, -1))
    v = v.transpose(perm)
    return v.reshape(b, t // p, c * p)


def squeeze_level_cond_perm(k: int, c: int) -> np.ndarray:
    """Weight-row permutation that makes the FREE row-major reshape
    ``[B, T, C] -> [B, T/2**k, 2**k * C]`` equivalent to
    :func:`squeeze_to_level` for anything consumed by a 1x1 conv:

        squeeze_to_level(x, k) @ W  ==  x.reshape(B, T>>k, C<<k) @ W[perm]

    (exactly, as a sum reordering).  The level-k squeeze layout is the
    reshape layout with channels permuted — ``squeeze_to_level`` channel
    ``2**k * c + bitrev_k(delta)`` holds reshape channel ``delta*C + c``
    — so a synthesis route can skip the per-block full-tensor
    ``squeeze_to_level`` copy of the conditioning (~4 ms/block at b128 x
    3.83 s) and permute the tiny cond weight rows instead.  Static numpy:
    computed at trace time, baked as a constant gather of the weights."""
    if k == 0:
        return np.arange(c)
    n = 1 << k
    jmap = np.empty(n * c, np.int64)
    for delta in range(n):
        rb = int(format(delta, f"0{k}b")[::-1], 2)
        for ch in range(c):
            jmap[n * ch + rb] = delta * c + ch
    return np.argsort(jmap)


def change_order(x):
    """Swap channel halves between flows (model.py:166-174). Involution."""
    a, b = jnp.split(x, 2, axis=2)
    return jnp.concatenate([b, a], axis=2)
