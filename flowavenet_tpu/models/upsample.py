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


import numpy as np


def _subpixel_plan(kh: int, s: int):
    """Static index plan for one transposed-conv scale.

    TF conv2d_transpose SAME with stride s, kernel height kh over an
    H-divisible input: y[o] = sum_h K[h] * x[(o + pad_top - h)/s] for h with
    (o + pad_top - h) % s == 0, pad_top = (kh - s)//2 (the forward conv's
    SAME top padding).  For o = i*s + p this gives per-phase taps
    (h, frame offset d).  Returns (offsets list, W[p, d_idx] -> h or -1).
    """
    pad_top = (kh - s) // 2
    taps = []  # (p, h, d)
    for p in range(s):
        h0 = (p + pad_top) % s
        for h in range(h0, kh, s):
            d = (p + pad_top - h) // s
            taps.append((p, h, d))
    offsets = sorted({d for _, _, d in taps})
    idx = np.full((s, len(offsets)), -1, np.int64)
    for p, h, d in taps:
        idx[p, offsets.index(d)] = h
    return offsets, idx


def _subpixel_upsample(x: jax.Array, kern: jax.Array, s: int) -> jax.Array:
    """One transposed-conv scale as a phase matmul.

    x: [B, H, W]; kern: [kh, 3] (out=in=1 squeezed).  Output [B, H*s, W].
    Bit-matches jax.lax.conv_transpose/TF SAME (tests/test_upsample.py).
    """
    kh = kern.shape[0]
    offsets, idx = _subpixel_plan(kh, s)
    B, H, W = x.shape
    dtype = x.dtype

    # unfold frame offsets (zero-padded edges) and the 3-tap W window
    d_lo, d_hi = -min(offsets), max(offsets)
    xp = jnp.pad(x, ((0, 0), (d_lo, d_hi), (0, 0)))
    xw = jnp.pad(xp, ((0, 0), (0, 0), (1, 1)))
    # frames[b, i, di, u, w] = x[b, i + offsets[di], w + 1 - u]
    # (same transposed-conv relation as the H axis: tap h reads input
    # o + pad - h, i.e. the kernel is applied flipped)
    frames = jnp.stack(
        [jnp.stack([jax.lax.dynamic_slice(
            xw, (0, d + d_lo, 2 - u), (B, H, W)) for u in range(3)], axis=2)
         for d in offsets], axis=2)              # [B, H, D, 3, W]

    # weights[p, di, u] = K[idx[p, di], u] (0 where no tap)
    kpad = jnp.concatenate([kern, jnp.zeros((1, 3), kern.dtype)], axis=0)
    wsub = kpad[idx]                              # [s, D, 3] (idx -1 -> 0 row)
    y = jnp.einsum("bhduw,pdu->bhpw", frames, wsub.astype(dtype),
                   preferred_element_type=jnp.float32).astype(dtype)
    return y.reshape(B, H * s, W)


def _dense_upsample(x: jax.Array, kern: jax.Array, s: int) -> jax.Array:
    """One transposed-conv scale as ONE dense MXU matmul.

    The subpixel form contracts only the 9 (frame, mel-tap) pairs — a K=9
    matmul that runs at ~7% MXU and cost 49 ms of the 1.2 s reverse pass at
    batch 96.  Folding the +-1 mel-bin taps into the contraction gives
    [B*H, D*(W+2)] x [D*(W+2), s*W]: ~27x more (mostly-zero) FLOPs but a
    dense K=240 matmul that runs in ~3 ms.  Bit-equal to the subpixel form
    (same taps, fp32 accumulation; tests/test_upsample.py).
    """
    kh = kern.shape[0]
    offsets, idx = _subpixel_plan(kh, s)
    D = len(offsets)
    B, H, W = x.shape
    dtype = x.dtype

    kpad = jnp.concatenate([kern, jnp.zeros((1, 3), kern.dtype)], axis=0)
    wsub = kpad[idx]                              # [s, D, 3]
    # frames column j holds x[.., j-1] (w-pad of 1), and tap u reads
    # x[w + 1 - u] => j = w + 2 - u:  A[d, j, p, w] = wsub[p, d, u]
    A = sum(
        jnp.einsum("pd,jw->djpw", wsub[:, :, u],
                   jnp.asarray(np.eye(W + 2, W, k=u - 2), wsub.dtype))
        for u in range(3))
    A2 = A.reshape(D * (W + 2), s * W).astype(dtype)

    d_lo, d_hi = -min(offsets), max(offsets)
    xp = jnp.pad(x, ((0, 0), (d_lo, d_hi), (1, 1)))    # [B, H+D-1, W+2]
    frames = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, d + d_lo, 0), (B, H, W + 2))
         for d in offsets], axis=-1)               # [B, H, D*(W+2)]
    y = jnp.einsum("bhk,kn->bhn", frames, A2,
                   preferred_element_type=jnp.float32).astype(dtype)
    return y.reshape(B, H * s, W)


def apply_upsample(params: list[dict], c: jax.Array, scales,
                   impl: str = "dense") -> jax.Array:
    """c: [B, T_mel, n_mels] -> [B, T_mel * prod(scales), n_mels].

    impl='dense' (default) lowers each scale to one dense MXU matmul;
    'subpixel' is the narrow phase-matmul form (same numerics, slower on
    TPU); 'conv_transpose' keeps the XLA op for cross-checking — the
    1-channel transposed conv maps terribly onto TPU conv units.
    """
    dtype = c.dtype
    if impl == "dense":
        h = c
        for p, s in zip(params, scales):
            k2 = _wn_kernel_t(p)[:, :, 0, 0].astype(dtype)   # [2s, 3]
            h = _dense_upsample(h, k2, s)
            h = h + p["b"].astype(dtype)
            h = jax.nn.leaky_relu(h, 0.4)
        return h
    if impl == "subpixel":
        h = c
        for p, s in zip(params, scales):
            k2 = _wn_kernel_t(p)[:, :, 0, 0].astype(dtype)   # [2s, 3]
            h = _subpixel_upsample(h, k2, s)
            h = h + p["b"].astype(dtype)
            h = jax.nn.leaky_relu(h, 0.4)
        return h
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
