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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = math.sqrt(0.5)


# Halo rows DMA'd beyond each tile.  Must be a sublane multiple: Mosaic's
# remote compiler crashes on odd-sized scratch windows (t_tile + 2d), so the
# window is padded to HALO and the input right-padded to match.  Supports
# dilations up to HALO//2.
HALO = 32



def _plan_tiles(T: int, t_tile: int) -> tuple[int, int]:
    """(t_tile, T_pad): tile rounded to the 16-row sublane quantum, time
    padded to a whole number of tiles.  Outputs beyond T are sliced away by
    the callers; Mosaic crashes on unaligned scratch windows otherwise."""
    if T <= 2 * t_tile:
        t_tile = -(-T // 16) * 16
    n_t = -(-T // t_tile)
    return t_tile, n_t * t_tile


def _resblock_kernel(hpad_ref, cond_ref, h_ref, wconv_ref, wres_ref,
                     bres_ref, wskip_ref, bskip_ref, hnew_ref, skip_ref,
                     scratch, sem, *, dilation: int, t_tile: int):
    b = pl.program_id(0)
    ti = pl.program_id(1)

    # DMA tile + halo from HBM: h_pad[b, ti*t_tile : ti*t_tile+t_tile+HALO, :]
    start = ti * t_tile
    dma = pltpu.make_async_copy(
        hpad_ref.at[b, pl.ds(start, t_tile + HALO), :],
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


def _dilated_conv_taps(h: jax.Array, w_conv: jax.Array, dilation: int,
                       causal: bool) -> jax.Array:
    """XLA reference math for the kernel's conv: y[t] = sum_k x_pad[t+kd] W[k]."""
    d = dilation
    pads = (2 * d, 0) if causal else (d, d)
    hp = jnp.pad(h, ((0, 0), pads, (0, 0)))
    T = h.shape[1]
    return sum(
        jnp.einsum("btc,cd->btd",
                   jax.lax.dynamic_slice_in_dim(hp, k * d, T, axis=1),
                   w_conv[k].astype(h.dtype),
                   preferred_element_type=jnp.float32)
        for k in range(3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fgr(h, cond_fg, w_conv, w_res, b_res, w_skip, b_skip,
         dilation, causal, t_tile, interpret):
    return _fused_forward(h, cond_fg, w_conv, w_res, b_res, w_skip, b_skip,
                          dilation=dilation, causal=causal, t_tile=t_tile,
                          interpret=interpret)


def fused_gated_resblock(h, cond_fg, w_conv, w_res, b_res, w_skip, b_skip,
                         *, dilation, causal, t_tile=512, interpret=False):
    """Differentiable fused resblock: Pallas forward, XLA backward with
    recomputation (flash-style — fg/gated are not stored)."""
    return _fgr(h, cond_fg, w_conv, w_res, b_res, w_skip, b_skip,
                dilation, causal, t_tile, interpret)


def _fgr_fwd(h, cond_fg, w_conv, w_res, b_res, w_skip, b_skip, dilation,
             causal, t_tile, interpret):
    out = _fused_forward(h, cond_fg, w_conv, w_res, b_res, w_skip, b_skip,
                         dilation=dilation, causal=causal, t_tile=t_tile,
                         interpret=interpret)
    return out, (h, cond_fg, w_conv, w_res, w_skip)


def _fgr_bwd(dilation, causal, t_tile, interpret, residuals, grads):
    h, cond_fg, w_conv, w_res, w_skip = residuals
    dh_new, dskip = grads
    r = w_res.shape[0]
    f32 = jnp.float32

    # recompute forward intermediates
    fg = _dilated_conv_taps(h, w_conv, dilation, causal) \
        + cond_fg.astype(f32)
    tf_ = jnp.tanh(fg[..., :r])
    sg = jax.nn.sigmoid(fg[..., r:])
    gated = tf_ * sg

    dres = dh_new.astype(f32) * SQRT_HALF
    dh = dres.astype(h.dtype)
    dgated = (jnp.einsum("btd,rd->btr", dres, w_res.astype(f32))
              + jnp.einsum("bts,rs->btr", dskip.astype(f32),
                           w_skip.astype(f32)))
    dw_res = jnp.einsum("btr,btd->rd", gated, dres).astype(w_res.dtype)
    db_res = jnp.sum(dres, axis=(0, 1))
    dw_skip = jnp.einsum("btr,bts->rs", gated,
                         dskip.astype(f32)).astype(w_skip.dtype)
    db_skip = jnp.sum(dskip.astype(f32), axis=(0, 1))

    df = dgated * sg * (1.0 - tf_ * tf_)
    dg = dgated * gated * (1.0 - sg)
    dfg = jnp.concatenate([df, dg], axis=-1)
    dcond = dfg.astype(cond_fg.dtype)

    # grad through the 3-tap conv: scatter back with flipped taps
    d = dilation
    T = h.shape[1]
    pads = (2 * d, 0) if causal else (d, d)
    dhp = jnp.zeros((h.shape[0], T + 2 * d, h.shape[2]), f32)
    dw_conv = []
    hp = jnp.pad(h, ((0, 0), pads, (0, 0))).astype(f32)
    for k in range(3):
        dhp = jax.lax.dynamic_update_slice_in_dim(
            dhp,
            jax.lax.dynamic_slice_in_dim(dhp, k * d, T, axis=1)
            + jnp.einsum("btd,cd->btc", dfg, w_conv[k].astype(f32)),
            k * d, axis=1)
        dw_conv.append(jnp.einsum(
            "btc,btd->cd",
            jax.lax.dynamic_slice_in_dim(hp, k * d, T, axis=1), dfg))
    dh = dh + jax.lax.dynamic_slice_in_dim(
        dhp, pads[0], T, axis=1).astype(h.dtype)
    dw_conv = jnp.stack(dw_conv).astype(w_conv.dtype)
    return (dh, dcond, dw_conv, dw_res, db_res, dw_skip, db_skip)


_fgr.defvjp(_fgr_fwd, _fgr_bwd)


def _fused_forward(h: jax.Array, cond_fg: jax.Array,
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
    assert 2 * d <= HALO, f"dilation {d} exceeds HALO//2={HALO // 2}"
    t_tile, T_pad = _plan_tiles(T, t_tile)
    lead = 2 * d if causal else d
    h_pad = jnp.pad(h, ((0, 0), (lead, T_pad - T + HALO - lead), (0, 0)))
    if T_pad != T:
        h = jnp.pad(h, ((0, 0), (0, T_pad - T), (0, 0)))
        cond_fg = jnp.pad(cond_fg, ((0, 0), (0, T_pad - T), (0, 0)))
    n_t = T_pad // t_tile

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
            jax.ShapeDtypeStruct((B, T_pad, R), dtype),
            jax.ShapeDtypeStruct((B, T_pad, S), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_tile + HALO, R), dtype),
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
    if T_pad != T:
        hnew, skip = hnew[:, :T], skip[:, :T]
    return hnew, skip


# ---------------------------------------------------------------------------
# v2: double-buffered halo DMA + conditioning matmul fused into the kernel.
#
# v1 reads a precomputed cond_fg [B, T, 2R] (a full fp/bf16 tensor written
# and re-read through HBM).  v2 reads the raw half-conditioning c [B, T, Cc]
# instead and computes c @ W_cond inside the kernel, eliminating that round
# trip (at block 0, cond_fg is 6.5x larger than c).  The halo DMA is double
# buffered across grid steps so the copy for tile i+1 overlaps tile i's
# matmuls.  VMEM budget restricts v2 to Cc <= ~2560 (blocks 0-5 of the
# default model); larger blocks take the v1/XLA path — they are <15% of
# reverse time.
# ---------------------------------------------------------------------------

V2_MAX_CC = 2560


def _resblock_kernel_v2(hpad_ref, c_ref, h_ref, wconv_ref, wcond_ref,
                        ball_ref, wres_ref, bres_ref, wskip_ref, bskip_ref,
                        hnew_ref, skip_ref, scratch, sem,
                        *, dilation: int, t_tile: int, n_t: int):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    win = t_tile + HALO

    @pl.when(ti == 0)
    def _warmup():
        pltpu.make_async_copy(
            hpad_ref.at[b, pl.ds(0, win), :], scratch.at[0], sem.at[0]
        ).start()

    # start the NEXT tile's DMA before waiting on ours
    @pl.when(ti + 1 < n_t)
    def _prefetch():
        nxt = (ti + 1) % 2
        pltpu.make_async_copy(
            hpad_ref.at[b, pl.ds((ti + 1) * t_tile, win), :],
            scratch.at[nxt], sem.at[nxt]).start()

    slot = ti % 2
    pltpu.make_async_copy(
        hpad_ref.at[b, pl.ds(ti * t_tile, win), :],
        scratch.at[slot], sem.at[slot]).wait()

    r = h_ref.shape[-1]
    acc = jnp.dot(c_ref[0], wcond_ref[:],
                  preferred_element_type=jnp.float32)
    acc += ball_ref[:].astype(jnp.float32)
    for k in range(3):
        tap = scratch[slot, pl.ds(k * dilation, t_tile), :]
        acc += jnp.dot(tap, wconv_ref[k], preferred_element_type=jnp.float32)

    gated = (jnp.tanh(acc[:, :r])
             * jax.nn.sigmoid(acc[:, r:])).astype(h_ref.dtype)

    res = jnp.dot(gated, wres_ref[:], preferred_element_type=jnp.float32)
    res += bres_ref[:].astype(jnp.float32)
    hnew_ref[0] = ((h_ref[0].astype(jnp.float32) + res)
                   * SQRT_HALF).astype(hnew_ref.dtype)
    sk = jnp.dot(gated, wskip_ref[:], preferred_element_type=jnp.float32)
    skip_ref[0] = (sk + bskip_ref[:].astype(jnp.float32)).astype(
        skip_ref.dtype)


def _fused_forward_v2(h, c, w_conv, w_cond, b_all, w_res, b_res, w_skip,
                      b_skip, *, dilation, causal, t_tile=512,
                      interpret=False):
    B, T, R = h.shape
    Cc = c.shape[-1]
    S = w_skip.shape[-1]
    d = dilation
    assert 2 * d <= HALO
    t_tile, T_pad = _plan_tiles(T, t_tile)
    lead = 2 * d if causal else d
    h_pad = jnp.pad(h, ((0, 0), (lead, T_pad - T + HALO - lead), (0, 0)))
    if T_pad != T:
        h = jnp.pad(h, ((0, 0), (0, T_pad - T), (0, 0)))
        c = jnp.pad(c, ((0, 0), (0, T_pad - T), (0, 0)))
    n_t = T_pad // t_tile

    dtype = h.dtype
    kernel = functools.partial(_resblock_kernel_v2, dilation=d,
                               t_tile=t_tile, n_t=n_t)

    def tb(i_b, i_t):
        return (i_b, i_t, 0)

    hnew, skip = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # h_pad manual DMA
            pl.BlockSpec((1, t_tile, Cc), tb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, R), tb, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w_conv
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w_cond
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b_all
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w_res
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b_res
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w_skip
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b_skip
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile, R), tb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, S), tb, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_pad, R), dtype),
            jax.ShapeDtypeStruct((B, T_pad, S), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + HALO, R), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (R * (3 * 2 * R + R + S) + Cc * 2 * R),
            bytes_accessed=(h_pad.size + c.size + 2 * h.size + B * T * S)
            * h.dtype.itemsize,
            transcendentals=2 * B * T * R,
        ),
        interpret=interpret,
    )(h_pad, c.astype(dtype), h, w_conv.astype(dtype),
      w_cond.astype(dtype), b_all.astype(jnp.float32),
      w_res.astype(dtype), b_res.astype(jnp.float32),
      w_skip.astype(dtype), b_skip.astype(jnp.float32))
    if T_pad != T:
        hnew, skip = hnew[:, :T], skip[:, :T]
    return hnew, skip


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _fgr2(h, c, w_conv, w_cond, b_all, w_res, b_res, w_skip, b_skip,
          dilation, causal, t_tile, interpret):
    return _fused_forward_v2(h, c, w_conv, w_cond, b_all, w_res, b_res,
                             w_skip, b_skip, dilation=dilation,
                             causal=causal, t_tile=t_tile,
                             interpret=interpret)


def fused_gated_resblock_v2(h, c, w_conv, w_cond, b_all, w_res, b_res,
                            w_skip, b_skip, *, dilation, causal,
                            t_tile=512, interpret=False):
    """v2 fused resblock taking raw half-conditioning c and its projection
    weights; differentiable (Pallas fwd, XLA bwd with recompute)."""
    return _fgr2(h, c, w_conv, w_cond, b_all, w_res, b_res, w_skip, b_skip,
                 dilation, causal, t_tile, interpret)


def _fgr2_fwd(h, c, w_conv, w_cond, b_all, w_res, b_res, w_skip, b_skip,
              dilation, causal, t_tile, interpret):
    out = _fused_forward_v2(h, c, w_conv, w_cond, b_all, w_res, b_res,
                            w_skip, b_skip, dilation=dilation, causal=causal,
                            t_tile=t_tile, interpret=interpret)
    return out, (h, c, w_conv, w_cond, b_all, w_res, w_skip)


def _fgr2_bwd(dilation, causal, t_tile, interpret, residuals, grads):
    h, c, w_conv, w_cond, b_all, w_res, w_skip = residuals
    f32 = jnp.float32
    cond_fg = (jnp.einsum("btc,cd->btd", c, w_cond.astype(c.dtype),
                          preferred_element_type=f32)
               + b_all.astype(f32))
    dh, dcond, dw_conv, dw_res, db_res, dw_skip, db_skip = _fgr_bwd(
        dilation, causal, t_tile, interpret,
        (h, cond_fg, w_conv, w_res, w_skip), grads)
    dcf = dcond.astype(f32)
    dc = jnp.einsum("btd,cd->btc", dcf,
                    w_cond.astype(f32)).astype(c.dtype)
    dw_cond = jnp.einsum("btc,btd->cd", c.astype(f32),
                         dcf).astype(w_cond.dtype)
    db_all = jnp.sum(dcf, axis=(0, 1))
    return (dh, dc, dw_conv, dw_cond, db_all, dw_res, db_res, dw_skip,
            db_skip)


_fgr2.defvjp(_fgr2_fwd, _fgr2_bwd)
