"""Convolution primitives for the flow model.

TPU-native replacements for the reference's weight-normalized Keras conv
layers (/root/reference/convolutional.py) and the pad-managed ``Conv`` /
``ZeroConv1d`` wrappers (/root/reference/modules.py:6-59).

All tensors are channels-last: activations ``[B, T, C]``, 1-D kernels
``[K, Cin, Cout]`` (TF layout, so reference checkpoints import directly).
Dilated convs lower to XLA ``conv_general_dilated`` which tiles onto the MXU;
1x1 convs are expressed as plain matmuls.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_WN_EPS = 1e-12  # tf.nn.l2_normalize epsilon (convolutional.py:80)


# ---------------------------------------------------------------------------
# Initializers (match TF he_uniform; modules.py:21-22 uses it for kernel AND
# bias, convolutional.py bias default is zeros).
# ---------------------------------------------------------------------------

def _tf_fans(shape) -> tuple[int, int]:
    """TF keras ``_compute_fans`` semantics."""
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def he_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    fan_in, _ = _tf_fans(shape)
    limit = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Weight-normalized 1-D conv
# ---------------------------------------------------------------------------

def init_wn_conv1d(key: jax.Array, in_ch: int, out_ch: int, kernel_size: int,
                   he_bias: bool = True) -> dict:
    """Params for a weight-normalized conv (convolutional.py:53-109).

    ``v`` is the raw kernel ``[K, Cin, Cout]``; effective kernel =
    l2_normalize(v, axis=[0,1]) * g (convolutional.py:80), g init 1.
    """
    kk, kb = jax.random.split(key)
    v = he_uniform(kk, (kernel_size, in_ch, out_ch))
    b = (he_uniform(kb, (out_ch,)) if he_bias
         else jnp.zeros((out_ch,), jnp.float32))
    return {"v": v, "g": jnp.ones((out_ch,), jnp.float32), "b": b}


def wn_kernel(p: dict) -> jax.Array:
    """Effective weight-normalized kernel, computed in fp32."""
    v = p["v"].astype(jnp.float32)
    sq = jnp.sum(v * v, axis=(0, 1), keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, _WN_EPS)) * p["g"].astype(jnp.float32)


# How k>1 dilated convs are computed: 'conv' = XLA conv_general_dilated;
# 'matmul' = im2col-style shifted-taps einsum, a single [B*T, K*Cin] x
# [K*Cin, Cout] MXU matmul; 'shifts' = K accumulated [B*T, Cin] x [Cin, Cout]
# matmuls on shifted views (no im2col materialization).  Measured on TPU v5e
# (synthesis, batch 64 x 4s): 'conv' 977 ms vs 'matmul' 1272 ms — the im2col
# materializes 3x activation traffic, so 'conv' is the default.
_CONV_IMPL = "conv"


def set_conv_impl(impl: str) -> None:
    global _CONV_IMPL
    assert impl in ("conv", "matmul", "shifts"), impl
    _CONV_IMPL = impl


def _conv_raw(x: jax.Array, kernel: jax.Array, pads: tuple, dilation: int
              ) -> jax.Array:
    """fp32-accumulated conv, output cast back to x.dtype.  Measured 7%
    faster end-to-end than the bf16-output form on v5e (973 vs 1040 ms
    reverse @ batch 64 x 4 s)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1,), padding=[pads],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_vjp(x, kernel, pads, dilation):
    return _conv_raw(x, kernel, pads, dilation)


def _conv_vjp_fwd(x, kernel, pads, dilation):
    return _conv_raw(x, kernel, pads, dilation), (x, kernel)


def _conv_vjp_bwd(pads, dilation, residuals, dy):
    # jax 0.9's built-in conv transpose rule rejects the f32-preferred /
    # bf16-operand mix, so spell out the standard conv gradients (also with
    # f32 accumulation).
    x, kernel = residuals
    k = kernel.shape[0]
    p = dilation * (k - 1)
    # dx: correlate dy with the tap-flipped, channel-transposed kernel;
    # padding complements the forward padding.
    k_flip = jnp.flip(kernel, axis=0).swapaxes(1, 2)
    dx = _conv_raw(dy, k_flip, (p - pads[0], p - pads[1]), dilation)
    # dk[j] = sum_t x_pad[t + j*d] (outer) dy[t]
    xp = jnp.pad(x, ((0, 0), pads, (0, 0)))
    T = dy.shape[1]
    dk = jnp.stack([
        jnp.einsum("btc,btd->cd",
                   jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=1),
                   dy, preferred_element_type=jnp.float32)
        for j in range(k)]).astype(kernel.dtype)
    return dx.astype(x.dtype), dk


_conv_vjp.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def dilated_conv1d(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array],
                   dilation: int = 1, causal: bool = False) -> jax.Array:
    """Explicit-padding dilated conv matching modules.py:24-33.

    causal: left-pad d*(k-1) (reference pads both sides then right-crops,
    modules.py:27-31 — identical result, half the padded compute).
    non-causal: symmetric pad d*(k-1)//2 (odd kernels only, as in reference).
    """
    k = kernel.shape[0]
    dtype = x.dtype
    pad = dilation * (k - 1)
    pads = (pad, 0) if causal else (pad // 2, pad - pad // 2)
    if k > 1 and _CONV_IMPL == "matmul":
        xp = jnp.pad(x, ((0, 0), pads, (0, 0)))
        T = x.shape[1]
        taps = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=1)
             for j in range(k)], axis=-1)                  # [B, T, K*Cin]
        w = kernel.astype(dtype).reshape(-1, kernel.shape[-1])
        out = jnp.einsum("btc,cd->btd", taps, w,
                         preferred_element_type=jnp.float32).astype(dtype)
    elif k > 1 and _CONV_IMPL == "shifts":
        xp = jnp.pad(x, ((0, 0), pads, (0, 0)))
        T = x.shape[1]
        w = kernel.astype(dtype)
        acc = None
        for j in range(k):
            xj = jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=1)
            oj = jnp.einsum("btc,cd->btd", xj, w[j],
                            preferred_element_type=jnp.float32)
            acc = oj if acc is None else acc + oj
        out = acc.astype(dtype)
    else:
        out = _conv_vjp(x, kernel.astype(dtype), pads, dilation)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def wn_conv1d(x: jax.Array, p: dict, dilation: int = 1,
              causal: bool = False) -> jax.Array:
    return dilated_conv1d(x, wn_kernel(p), p["b"], dilation, causal)


def conv1x1(x: jax.Array, kernel: jax.Array,
            bias: Optional[jax.Array]) -> jax.Array:
    """1x1 conv as a matmul (MXU path). kernel ``[1, Cin, Cout]`` or
    ``[Cin, Cout]``."""
    w = kernel[0] if kernel.ndim == 3 else kernel
    out = jnp.einsum("btc,cd->btd", x, w.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def wn_conv1x1(x: jax.Array, p: dict) -> jax.Array:
    return conv1x1(x, wn_kernel(p), p["b"])


def quantize_act(x: jax.Array, per_row: bool = False
                 ) -> tuple[jax.Array, jax.Array]:
    """Max-abs int8 activation quantization: (q, fp32 scale).

    Mirrors the Pallas kernels' in-VMEM activation quantization
    (ops/pallas_flow.py _quant_act) so the XLA int8 route below has the
    same numeric contract as the fused-kernel int8 route.

    ``per_row=True`` (rank-3 [B, T, C] input) computes one scale PER
    BATCH ROW ([B, 1, 1]) instead of per tensor.  This is what keeps a
    serving micro-batch composition-invariant: with a whole-batch amax,
    one request's int8 codes — and therefore its audio — would depend on
    its batch companions' content (serving/server.py's determinism
    contract)."""
    xf = x.astype(jnp.float32)
    amax = (jnp.max(jnp.abs(xf), axis=(1, 2), keepdims=True) if per_row
            else jnp.max(jnp.abs(xf)))
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def conv1x1_int8(x_q: jax.Array, x_scale: jax.Array, kernel: jax.Array,
                 bias: Optional[jax.Array], out_dtype) -> jax.Array:
    """1x1 conv on the int8 MXU path (2x bf16 peak on v5e).

    ``x_q``/``x_scale`` come from :func:`quantize_act`; ``kernel``
    ``[1, Cin, Cout]`` or ``[Cin, Cout]`` fp32 is quantized here with
    per-out-channel max-abs scales; the s8 x s8 -> s32 einsum lowers to a
    native int8 MXU matmul under XLA:TPU."""
    w = (kernel[0] if kernel.ndim == 3 else kernel).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    w_scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    w_q = jnp.clip(jnp.round(w / w_scale[None, :]), -127.0, 127.0
                   ).astype(jnp.int8)
    acc = jnp.einsum("btc,cd->btd", x_q, w_q,
                     preferred_element_type=jnp.int32)
    # x_scale is a scalar (per-tensor) or [B, 1, 1] (per-row); both
    # broadcast against acc [B, T, K] * w_scale [K]
    out = (acc.astype(jnp.float32) * jnp.asarray(x_scale, jnp.float32)
           * w_scale[None, None, :]).astype(out_dtype)
    if bias is not None:
        out = out + bias.astype(out_dtype)
    return out


# ---------------------------------------------------------------------------
# ZeroConv1d (modules.py:39-59): zero-init 1x1 conv, no weight norm, output
# scaled by exp(3*scale) with zero-init per-channel scale — the Glow-style
# "coupling net starts as exact zero" trick.
# ---------------------------------------------------------------------------

def init_zero_conv1d(in_ch: int, out_ch: int) -> dict:
    return {
        "w": jnp.zeros((1, in_ch, out_ch), jnp.float32),
        "b": jnp.zeros((out_ch,), jnp.float32),
        "scale": jnp.zeros((out_ch,), jnp.float32),
    }


def zero_conv1d(x: jax.Array, p: dict) -> jax.Array:
    out = conv1x1(x, p["w"], p["b"])
    return out * jnp.exp(p["scale"].astype(x.dtype) * 3.0)
