"""Squeeze / unsqueeze: trade time resolution for channels.

Bit-exact layout parity with the reference (model.py:224-239, 259-277):
output channel ``2*c + p`` takes input ``(t = 2*t2 + p, c)`` — i.e. reshape
``[B,T,C] -> [B,T/2,2,C]``, transpose to ``[B,T/2,C,2]``, flatten.
"""

from __future__ import annotations

import jax.numpy as jnp


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


def change_order(x):
    """Swap channel halves between flows (model.py:166-174). Involution."""
    a, b = jnp.split(x, 2, axis=2)
    return jnp.concatenate([b, a], axis=2)
