"""Mel-conditioning upsampler: stack of weight-normalized transposed convs.

Reference: /root/reference/model.py:301-311, 398-404 — for each scale ``s``
one ``Conv2DTranspose(filters=1, kernel=(2s,3), strides=(s,1), SAME,
leaky_relu(0.4))`` over the mel treated as an image [B, T_mel, n_mels, 1].
Product of scales == hop_size, so output time = T_mel * hop.

TF ``conv2d_transpose`` SAME semantics are matched exactly by
``jax.lax.conv_transpose(..., padding='SAME', transpose_kernel=True)`` with
the TF kernel layout (H, W, out, in) — verified against TF 2.21 to 5e-7
(tests/test_upsample.py).  Weight norm follows convolutional.py:179-186:
l2_normalize over axes [0, 2] times g (g broadcasts over the last axis as in
the reference; with filters == in == 1 all interpretations coincide).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.conv import he_uniform

_WN_EPS = 1e-12


def init_upsample(key: jax.Array, scales) -> list[dict]:
    params = []
    for s, k in zip(scales, jax.random.split(key, len(scales))):
        v = he_uniform(k, (2 * s, 3, 1, 1))  # (H, W, out, in) TF layout
        params.append({"v": v, "g": jnp.ones((1,), jnp.float32),
                       "b": jnp.zeros((1,), jnp.float32)})
    return params


def _wn_kernel_t(p: dict) -> jax.Array:
    v = p["v"].astype(jnp.float32)
    sq = jnp.sum(v * v, axis=(0, 2), keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, _WN_EPS)) * p["g"].astype(jnp.float32)


def apply_upsample(params: list[dict], c: jax.Array, scales) -> jax.Array:
    """c: [B, T_mel, n_mels] -> [B, T_mel * prod(scales), n_mels]."""
    dtype = c.dtype
    h = c[..., None]  # [B, T_mel, n_mels, 1]
    for p, s in zip(params, scales):
        k = _wn_kernel_t(p).astype(dtype)
        h = jax.lax.conv_transpose(
            h, k, strides=(s, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
            transpose_kernel=True)
        h = h + p["b"].astype(dtype)
        h = jax.nn.leaky_relu(h, 0.4)
    return h[..., 0]
