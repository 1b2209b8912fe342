"""Pallas TPU kernel: fused gated ResBlock core.

The hot op of the model (~96 instances per forward/reverse pass): a k=3
dilated conv producing filter+gate pre-activations, the gated tanh*sigmoid
unit, and the residual/skip 1x1 projections (reference modules.py:110-128).

Fusion strategy (one kernel per ResBlock):
  inputs : h_pad   [B, T + 2d, R]   (symmetrically pre-padded activations)
           cond_fg [B, T, 2R]       (conditioning projections + all biases,
                                     precomputed — they are per-flow matmuls
                                     XLA already handles at MXU peak)
           h       [B, T, R]        (residual input)
           weights W_conv [3, R, 2R], W_res [R, R], W_skip [R, S] (+biases)
  outputs: h_new [B, T, R], skip [B, T, S]

The kernel tiles time; each grid step DMAs its tile + 2d halo from HBM into
VMEM scratch, computes the 3-tap dilated conv as 3 shifted matmuls on the
MXU, applies the gate on the VPU, and runs both 1x1 projections — h stays in
VMEM across all five matmuls instead of round-tripping to HBM between them.
Weights live in VMEM for the whole grid (<=1 MB at R=S=256 in bf16).

Causality note: causal mode left-pads by 2d (crop-right semantics,
modules.py:30-31); non-causal pads d each side.  The kernel itself is
padding-agnostic: it convolves taps [0, d, 2d] of the padded stream.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = math.sqrt(0.5)


def _resblock_kernel(hpad_ref, cond_ref, h_ref, wconv_ref, wres_ref,
                     bres_ref, wskip_ref, bskip_ref, hnew_ref, skip_ref,
                     scratch, sem, *, dilation: int, t_tile: int):
    b = pl.program_id(0)
    ti = pl.program_id(1)

    # DMA tile + halo from HBM: h_pad[b, ti*t_tile : ti*t_tile + t_tile+2d, :]
    start = ti * t_tile
    dma = pltpu.make_async_copy(
        hpad_ref.at[b, pl.ds(start, t_tile + 2 * dilation), :],
        scratch, sem)
    dma.start()
    dma.wait()

    r = h_ref.shape[-1]
    # 3-tap dilated conv as shifted matmuls (MXU), accumulate in fp32
    acc = cond_ref[0].astype(jnp.float32)
    for k in range(3):
        tap = scratch[pl.ds(k * dilation, t_tile), :]
        acc += jnp.dot(tap, wconv_ref[k],
                       preferred_element_type=jnp.float32)

    h_f = acc[:, :r]
    h_g = acc[:, r:]
    gated = (jnp.tanh(h_f) * jax.nn.sigmoid(h_g)).astype(h_ref.dtype)

    res = jnp.dot(gated, wres_ref[:], preferred_element_type=jnp.float32)
    res += bres_ref[:].astype(jnp.float32)
    hnew_ref[0] = ((h_ref[0].astype(jnp.float32) + res)
                   * SQRT_HALF).astype(hnew_ref.dtype)

    sk = jnp.dot(gated, wskip_ref[:], preferred_element_type=jnp.float32)
    skip_ref[0] = (sk + bskip_ref[:].astype(jnp.float32)).astype(
        skip_ref.dtype)


def fused_gated_resblock(h: jax.Array, cond_fg: jax.Array,
                         w_conv: jax.Array, w_res: jax.Array,
                         b_res: jax.Array, w_skip: jax.Array,
                         b_skip: jax.Array, *, dilation: int, causal: bool,
                         t_tile: int = 512,
                         interpret: bool = False
                         ) -> tuple[jax.Array, jax.Array]:
    """Fused (h_new, skip) for one gated ResBlock.

    h: [B, T, R]; cond_fg: [B, T, 2R] (conditioning + conv biases already
    summed); w_conv: [3, R, 2R] taps in time order.
    """
    B, T, R = h.shape
    S = w_skip.shape[-1]
    d = dilation
    pad = 2 * d
    if causal:
        h_pad = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
    else:
        h_pad = jnp.pad(h, ((0, 0), (d, d), (0, 0)))

    t_tile = min(t_tile, T)
    if T % t_tile != 0:
        # fall back to a tile size that divides T (T is a power-of-two times
        # the mel hop in this model, so this terminates quickly)
        t = t_tile
        while T % t != 0:
            t //= 2
        t_tile = max(t, 1)
    n_t = T // t_tile

    dtype = h.dtype
    kernel = functools.partial(_resblock_kernel, dilation=d, t_tile=t_tile)
    grid = (B, n_t)

    def time_block(i_b, i_t):
        return (i_b, i_t, 0)

    hnew, skip = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # h_pad: manual DMA
            pl.BlockSpec((1, t_tile, 2 * R), time_block,
                         memory_space=pltpu.VMEM),     # cond_fg
            pl.BlockSpec((1, t_tile, R), time_block,
                         memory_space=pltpu.VMEM),     # h
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_conv
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_res
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b_res
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_skip
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b_skip
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile, R), time_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, S), time_block,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, R), dtype),
            jax.ShapeDtypeStruct((B, T, S), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_tile + pad, R), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * R * (3 * 2 * R + R + S),
            bytes_accessed=(h_pad.size + cond_fg.size + 2 * h.size
                            + B * T * S) * h.dtype.itemsize,
            transcendentals=2 * B * T * R,
        ),
        interpret=interpret,
    )(h_pad, cond_fg.astype(dtype), h, w_conv.astype(dtype),
      w_res.astype(dtype), b_res.astype(jnp.float32),
      w_skip.astype(dtype), b_skip.astype(jnp.float32))
    return hnew, skip
