"""Pallas TPU kernel: fully-fused pair-flow REVERSE step.

One kernel computes an entire reverse flow PAIR (two flows of a block, the
unit of the pair-scan in models/flowavenet.py) over a time tile:

    u <- u * exp(log_s(v; odd)) + t(v; odd)      AffineCoupling.reverse
    v <- v * sA - bA ; u <- u * sB - bB          ActNorm.reverse (odd)
    v <- v * exp(log_s(u; even)) + t(u; even)    AffineCoupling.reverse
    u <- u * sC - bC ; v <- v * sD - bD          ActNorm.reverse (even)

where each log_s/t comes from the full WaveNet coupling net (reference
modules.py:134-189: front k=3 conv -> relu -> 2 gated ResBlocks with
dilations 1,3 and fused conditioning -> skip-sum -> relu -> 1x1 -> relu ->
zero conv * exp(3 scale)).

Why: the XLA path runs ~60 separate HLO ops per pair step; at synthesis
shapes the model is compute-dense (~0.37 TFLOP per audio-second) and the
fusion boundaries + HBM round trips between those ops cap MXU utilization
at ~50%.  Here every intermediate lives in VMEM: per tile the kernel reads
u, v, c_a, c_b (+halo) once, runs all ~20 matmuls back to back on the MXU,
and writes u', v' once.

Scope (falls back to XLA otherwise): affine couplings, non-causal, n_layer
== 2, kernel_size == 3 (dilations 1, 3), no global conditioning.  The
receptive field of the chained pair is +-10, covered by a 16-row halo on
each side of the tile.

Weight-norm kernels, the ZeroConv exp(3*scale), and the ActNorm
exp(-3*logs) are all folded OUTSIDE the kernel (inference-only transform).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Halo rows on EACH side of a tile (receptive field of the fused pair is 10;
# 16 keeps DMA windows sublane-aligned).  Window = t_tile + 2*HALO.
HALO = 16

# Mosaic scoped-VMEM budget for kernel temporaries.  The default 16 MB
# limit OOMs the hoisted deep-block kernels (and capped tile sizes for the
# early blocks); v5e has 128 MB of VMEM total, so grant the kernels a
# bigger stack and leave headroom for the pipeline's double-buffered
# input/output blocks.
VMEM_LIMIT_BYTES = 64 * 1024 * 1024

SQRT_HALF = 0.7071067811865476

# Precision of the tanh/sigmoid gate evaluation inside the kernel.  fp32
# matches the XLA path bit-for-bit; bfloat16 would halve the VPU work but
# MEASURED SLOWER end to end (b128 x 3.83 s with int8: 1115.3 vs 1084.4
# ms — the exp-based tanh/sigmoid workaround for the Mosaic bf16
# vector.broadcast bug costs more than the narrower VPU lanes save).
# FWN_GATE_BF16=1 keeps the probe available.
from ..utils.flags import env_flag as _env_flag, env_int as _env_int

GATE_DTYPE = jnp.bfloat16 if _env_flag("FWN_GATE_BF16") else jnp.float32

# Accumulation dtype for the kernels' conv/skip/final chains.  fp32 only:
# a bf16-accumulation variant (FWN_ACC_BF16, round 2) is REJECTED — the
# current Mosaic toolchain requires 32-bit matmul accumulators ("Expected
# matmul acc to be 32-bit" verifier error, measured 2026-08-17), so the
# knob could only ever crash at runtime and has been removed.
ACC_DTYPE = jnp.float32

# Grid dimension semantics: tiles are independent, so "parallel" lets
# Mosaic overlap adjacent grid steps; FWN_GRID_ARBITRARY=1 reverts.
_GRID_ARBITRARY = _env_flag("FWN_GRID_ARBITRARY")

# Time-tile for the direct (non-Winograd) pair kernels.  1024 was the
# bf16 sweep winner (1536/2048 lose/exceed VMEM); int8 weights halve the
# resident footprint and 1536 WINS there (b128 x 3.83 s: 1049.5 vs
# 1064.3 ms).  FWN_DIRECT_TT overrides for both modes; otherwise the
# tile follows the int8-ness of the LAUNCH (direct_t_tile below), not a
# flag frozen at import — tools that toggle flowavenet.PAIR_KERNEL_INT8
# at runtime (tools/int8_quality_gate.py) must get the tile each mode
# was actually swept at, not the other mode's.
DIRECT_T_TILE = _env_int("FWN_DIRECT_TT", 0, multiple_of=16) or None


def direct_t_tile(int8: bool) -> int:
    """Default time-tile for a direct pair-kernel launch in this mode."""
    tt = DIRECT_T_TILE or (1536 if int8 else 1024)
    if int8 and tt > 1664:
        # measured 2026-08-17: FWN_DIRECT_TT=1792 with the s8
        # conditioning tiles WEDGES the device on first execution (never
        # returns; the process must be killed).  Fail fast instead of
        # hanging a job.
        raise ValueError(
            f"FWN_DIRECT_TT={tt} > 1664 hangs the int8 kernels "
            "on v5e (measured device wedge); use <= 1664 or FWN_INT8=0")
    return tt

# int8 mode quantizes the fg convs and the conditioning 1x1 matmuls (the
# direct kernel's second-largest MXU consumer — Cc/2 reaches 640 at
# block 3).  The front conv, the final 1x1, and the zero conv (whose
# output IS log_s/t) stay high-precision.  Quality-gated on trained
# weights: tools/int8_quality_gate.py.
#
# FWN_INT8_RS=1 additionally runs the res/skip matmuls on int8 via
# FIXED-scale gate quantization (_gated_q8 — no max-abs pass, unlike the
# round-3 full-int8 variant that measured 1158 ms).  MEASURED NEUTRAL-to-
# SLIGHTLY-SLOWER (b128 x 3.83 s: 989.9 vs 983.6 ms): those K=256
# matmuls are pipeline-bound, not MXU-bound, so halving their MXU time
# buys nothing and the dequant multiply adds VPU work.  Default OFF;
# quality-gated anyway (corr 0.999953 vs bf16 on trained weights).
INT8_RS = _env_flag("FWN_INT8_RS", default=False)


# FWN_Q8_BF16=1: run the quantization amax reduce over the activations
# in their storage dtype (bf16) instead of widening to fp32 first — bf16
# abs/max are EXACT so the scale is identical and the reduce consumes
# half the VPU lanes.  MEASURED NEUTRAL (918.2 vs 905-914 ms at b128 x
# 3.83 s: the amax pass pipelines behind the matmuls either way), so the
# default keeps the simpler f32 pass.  The round itself must stay f32
# regardless: Mosaic has no bf16 roundeven (fails to legalize, measured
# 2026-08-17).
Q8_BF16 = _env_flag("FWN_Q8_BF16")


def _quant_act(x):
    """max-abs int8 quantization of a VMEM value: (q_int8, f32 scale)."""
    f32 = jnp.float32
    if Q8_BF16 and x.dtype == jnp.bfloat16:
        # two-stage reduce: the big (row) pass stays bf16; only the
        # [C]-sized tail converts to f32 (Mosaic cannot scalarize a
        # bf16 reduction result)
        amax = jnp.max(jnp.max(jnp.abs(x), axis=0).astype(f32))
    else:
        amax = jnp.max(jnp.abs(x.astype(f32)))
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x.astype(f32) / scale), -127.0, 127.0
                 ).astype(jnp.int8)
    return q, scale


def _conv3_int8(buf, wq, wscale, *, off: int, length: int,
                dilation: int):
    """3-tap dilated conv on the int8 MXU path: buf (bf16) is quantized
    per call with a max-abs scale; wq int8 [3, Cin, Cout] with per-channel
    wscale f32 [Cout].  Returns ACC_DTYPE like _conv3."""
    f32 = jnp.float32
    q, a_scale = _quant_act(buf)
    acc = None
    for k in range(3):
        start = off - dilation + k * dilation
        tap = jax.lax.slice_in_dim(q, start, start + length, axis=0)
        o = jnp.dot(tap, wq[k], preferred_element_type=jnp.int32)
        acc = o if acc is None else acc + o
    return (acc.astype(f32) * (a_scale * wscale)[None, :]).astype(ACC_DTYPE)


def _conv3(buf, w, *, off: int, length: int, dilation: int):
    """3-tap dilated conv over a VMEM-resident value.

    buf[j] holds position (j - off) relative to the output's first row;
    returns ACC_DTYPE [length, Cout] = sum_k buf[row + (k-1)*d] @ w[k].
    """
    cin = buf.shape[-1]
    acc = None
    for k in range(3):
        start = off - dilation + k * dilation
        tap = jax.lax.slice_in_dim(buf, start, start + length, axis=0)
        if cin >= 8:
            o = jnp.dot(tap, w[k], preferred_element_type=ACC_DTYPE)
        else:
            # tiny-Cin taps (early blocks: u/v have 1-4 channels) are
            # broadcast multiplies on the VPU, not degenerate MXU passes
            o = None
            for c in range(cin):
                t_ = (tap[:, c:c + 1].astype(ACC_DTYPE)
                      * w[k][c].astype(ACC_DTYPE)[None, :])
                o = t_ if o is None else o + t_
        acc = o if acc is None else acc + o
    return acc


# Timing probe: FWN_NO_MASK=1 skips ALL edge masking (numerically wrong at
# sequence edges; bounds the masks' VPU cost).
_NO_MASK = _env_flag("FWN_NO_MASK")


def _mask_valid(x, row0, T: int):
    """Zero rows whose global position falls outside [0, T).

    The reference zero-pads EVERY conv's input at the sequence edges
    (modules.py:24-33); intermediates like relu(conv(0) + bias) are nonzero
    there, so anything another conv consumes must be re-zeroed outside the
    sequence.  row0 = global position of x's row 0 (traced scalar).

    Measured free: the iota/compare/where fuses into the pipeline (405.2 ==
    405.2 ms with FWN_NO_MASK at the block-0 bench shape); gating it behind
    a lax.cond on an interior-tile predicate was 100 ms SLOWER — Mosaic
    conds break the software pipeline."""
    if _NO_MASK:
        return x
    pos = row0 + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where((pos >= 0) & (pos < T), x, jnp.zeros_like(x))


_NO_GATE = _env_flag("FWN_NO_GATE")  # timing probe: skip tanh/sig


def _gated(fg, r: int, dtype):
    """tanh(f) * sigmoid(g) on the fused [.., 2R] pre-activation.

    In bf16 GATE_DTYPE, jnp.tanh trips a Mosaic verifier bug
    (vector.broadcast element type); compute both gates via exp instead:
    tanh(x) = 2/(1+exp(-2x)) - 1, sigmoid(x) = 1/(1+exp(-x))."""
    if _NO_GATE:
        return (fg[:, :r] + fg[:, r:]).astype(dtype)
    fg = fg.astype(GATE_DTYPE)
    f, g = fg[:, :r], fg[:, r:]
    if GATE_DTYPE == jnp.float32:
        return (jnp.tanh(f) * jax.nn.sigmoid(g)).astype(dtype)
    one = jnp.asarray(1.0, GATE_DTYPE)
    two = jnp.asarray(2.0, GATE_DTYPE)
    th = two / (one + jnp.exp(-two * f)) - one
    sg = one / (one + jnp.exp(-g))
    return (th * sg).astype(dtype)


def _gated_q8(fg, r: int):
    """tanh(f)*sigmoid(g) quantized to int8 with the FIXED scale 1/127.

    |tanh*sigmoid| < 1 analytically, so — unlike every other int8
    activation here — NO max-abs reduction pass is needed: the
    round+cast replaces the bf16 cast the fp32 gates pay anyway.  This
    is what makes int8 res/skip matmuls pay (the per-call max-abs
    variant was measured SLOWER end to end, docs/benchmarks.md)."""
    fg = fg.astype(jnp.float32)
    out = jnp.tanh(fg[:, :r]) * jax.nn.sigmoid(fg[:, r:])
    return jnp.round(out * 127.0).astype(jnp.int8)


def _coupling_net(x_buf, c_buf, *, x_off: int, c_off: int, out_len: int,
                  row0, T: int,
                  front_w, front_b, kfg, cond_w, cond_b, res_w, res_b,
                  skip_w, skip_b, fin_w, fin_b, zw, zb, dtype,
                  c_act_scale=None):
    """WaveNet coupling net over VMEM values.

    x_buf[j] = net input at position (j - x_off); c_buf likewise with c_off.
    Produces the zero-conv output (log_s || t) for rows [0, out_len) of the
    tile-relative frame where row 0 == x position x_off.  ``row0`` is the
    global sequence position of output row 0 (for edge masking); T the true
    sequence length.

    ``cond_w=None`` = HOISTED conditioning: c_buf holds the precomputed
    per-layer conditioning pre-activations ``c_half @ cond_w`` concatenated
    on channels (layer0 || layer1, 2R wide each) instead of raw c — the
    cond matmul ran outside the kernel (deep blocks, where the cond weights
    exceed VMEM).  cond_b is still added here.

    Region bookkeeping (all static): the net output over [a, a+L) needs
    h1 over +-3, h0 over +-4, x over +-5 relative to that region.
    """
    acc = ACC_DTYPE
    if isinstance(kfg, tuple):           # int8 fg path: (wq, wscale)
        kq, ks = kfg
        w2r = kq.shape[-1]

        def conv_fg(buf, l, off, length, dil):
            return _conv3_int8(buf, kq[l], ks[l], off=off, length=length,
                               dilation=dil)
    else:
        w2r = kfg.shape[-1]  # 2R: fused filter|gate width

        def conv_fg(buf, l, off, length, dil):
            return _conv3(buf, kfg[l], off=off, length=length,
                          dilation=dil)
    if isinstance(cond_w, tuple):        # int8 cond path: (cq, cscale)
        cq, cs = cond_w
        if c_buf.dtype == jnp.int8:
            # conditioning arrives PRE-quantized (one PER-ROW max-abs
            # pass in reverse(), shared by every block); this grid step
            # carries ONE batch row, so its activation scale arrives as
            # the scalar ``c_act_scale`` — no in-kernel amax/round pass
            # and half the c HBM/DMA bytes.  (c_act_scale=None keeps the
            # legacy fold-into-cs contract: scale pre-multiplied into the
            # cond weight scales outside the kernel.)
            c_q = c_buf
            c_scale = (jnp.float32(1.0) if c_act_scale is None
                       else c_act_scale.astype(jnp.float32))
        else:
            c_amax = jnp.max(jnp.abs(c_buf.astype(jnp.float32)))
            c_scale = jnp.maximum(c_amax, 1e-30) * (1.0 / 127.0)
            c_q = jnp.clip(jnp.round(c_buf.astype(jnp.float32) / c_scale),
                           -127.0, 127.0).astype(jnp.int8)

        def cond_dot(l, off, length):
            tap = jax.lax.slice_in_dim(c_q, off, off + length, axis=0)
            o = jnp.dot(tap, cq[l], preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32)
                    * (c_scale * cs[l])[None, :]).astype(acc)
    else:
        cond_dot = None
    # h0 = relu(front(x)) over [-4, out_len+4)
    l_h0 = out_len + 8
    h0 = _conv3(x_buf, front_w, off=x_off - 4, length=l_h0, dilation=1)
    h0 = jnp.maximum(h0 + front_b.astype(acc), 0.0).astype(dtype)
    h0 = _mask_valid(h0, row0 - 4, T)

    # layer 0 (d=1): fg over [-3, out_len+3)
    l_g0 = out_len + 6
    fg0 = conv_fg(h0, 0, 1, l_g0, 1)
    if cond_dot is not None:
        fg0 += cond_dot(0, c_off - 3, l_g0)
    else:
        c0 = jax.lax.slice_in_dim(c_buf, c_off - 3, c_off - 3 + l_g0,
                                  axis=0)
        if cond_w is None:
            fg0 += c0[:, :w2r].astype(acc)
        else:
            fg0 += jnp.dot(c0, cond_w[0], preferred_element_type=acc)
    fg0 += cond_b[0].astype(acc)
    r = fg0.shape[-1] // 2
    # res and skip0 share the same input: one [R, 2R] dot (the weight
    # concat is loop-invariant and tiny)
    if isinstance(res_w, tuple):
        # int8 res/skip: gate output quantized with the FIXED 1/127
        # scale (see _gated_q8), weights pre-quantized per-out-channel
        res_wq, res_ws = res_w
        skip_wq, skip_ws = skip_w
        rs_wq = jnp.concatenate([res_wq, skip_wq[0]], axis=-1)
        # scales concat as 2-D rows: Mosaic can't lower a 1-D vector
        # concat ("input offsets outside the first tile")
        rs_s = jnp.concatenate([res_ws.reshape(1, -1),
                                skip_ws[0].reshape(1, -1)],
                               axis=-1) * (1.0 / 127.0)
        g0q = _gated_q8(fg0, r)
        rs = (jnp.dot(g0q, rs_wq, preferred_element_type=jnp.int32)
              .astype(jnp.float32) * rs_s).astype(acc)
    else:
        gated0 = _gated(fg0, r, dtype)
        rs_w = jnp.concatenate([res_w, skip_w[0]], axis=-1)
        rs = jnp.dot(gated0, rs_w, preferred_element_type=acc)
    res0 = rs[:, :r] + res_b.astype(acc)
    h0_mid = jax.lax.slice_in_dim(h0, 1, 1 + l_g0, axis=0)
    h1 = ((h0_mid.astype(acc) + res0) * SQRT_HALF).astype(dtype)
    h1 = _mask_valid(h1, row0 - 3, T)

    # layer 1 (d=3): fg over [0, out_len)
    fg1 = conv_fg(h1, 1, 3, out_len, 3)
    if cond_dot is not None:
        fg1 += cond_dot(1, c_off, out_len)
    else:
        c1 = jax.lax.slice_in_dim(c_buf, c_off, c_off + out_len, axis=0)
        if cond_w is None:
            fg1 += c1[:, w2r:].astype(acc)
        else:
            fg1 += jnp.dot(c1, cond_w[1], preferred_element_type=acc)
    fg1 += cond_b[1].astype(acc)
    sk0 = jax.lax.slice_in_dim(rs[:, r:], 3, 3 + out_len, axis=0)
    sk0 += skip_b[0].astype(acc)
    if isinstance(skip_w, tuple):
        g1q = _gated_q8(fg1, r)
        sk1 = (jnp.dot(g1q, skip_wq[1], preferred_element_type=jnp.int32)
               .astype(jnp.float32)
               * (skip_ws[1] * (1.0 / 127.0))[None, :]).astype(acc)
    else:
        gated1 = _gated(fg1, r, dtype)
        sk1 = jnp.dot(gated1, skip_w[1], preferred_element_type=acc)
    sk1 += skip_b[1].astype(acc)

    out = jnp.maximum(sk0 + sk1, 0.0).astype(dtype)
    out = jnp.dot(out, fin_w, preferred_element_type=acc)
    out = jnp.maximum(out + fin_b.astype(acc), 0.0).astype(dtype)
    # zero conv with exp(3*scale) folded into zw/zb; fp32 for the
    # downstream affine exp/update regardless of ACC_DTYPE
    net = jnp.dot(out, zw, preferred_element_type=jnp.float32)
    return net + zb.astype(jnp.float32)


# FWN_FLAT_UV=1: pass the u/v tiles to the direct kernels refolded to a
# DENSE [t_tile*R_in/128, 128] view instead of [t_tile, R_in].  The
# early blocks' tiny channel counts (R_in = 1..16) force the custom
# call's [.., R_in] tiled layout to pad lanes up to 128x, and
# converting to/from that padded layout is the "input tile/halo view"
# copy line in the profile (~2-4% of the reverse pass,
# docs/benchmarks.md HBM accounting).  The [rows, 128] refold is dense
# AND natively (8,128)-tileable (whole-tile blocks equal the array
# dims); the kernel instead pays a small in-VMEM relayout per tile.
# Measured on chip before promoting.
FLAT_UV = _env_flag("FWN_FLAT_UV")


def _win_cat(tile_ref, halo_ref, halo: int):
    """[left-halo | tile | right-halo] assembled in VMEM.  A flat
    [rows, 128] tile read (dense u/v layout, FWN_FLAT_UV) is re-folded
    to [t_tile, C] using the halo block's channel count."""
    t = tile_ref[0, 0]
    h = halo_ref[0, 0]
    if t.ndim == 1 or t.shape[-1] != h.shape[-1]:
        t = t.reshape(-1, h.shape[-1])
    return jnp.concatenate([h[:halo], t, h[halo:]], axis=0)


def _chain_halo(n_pair: int) -> int:
    """Halo rows per side for an n_pair chain: each executed pair consumes
    10 rows/side (coupling RF 5 + 5), rounded up to sublane alignment."""
    return max(HALO, 8 * (-(-10 * n_pair // 8)))


def _pair_kernel(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref, cbt_ref,
                 cbh_ref, front_w, front_b, kfg,
                 cond_w, cond_b, res_w, res_b, skip_w, skip_b, fin_w, fin_b,
                 zw, zb, an_s, an_b, u_out, v_out,
                 *, t_tile: int, n_t: int, T: int, n_pair: int = 1,
                 c_row_scale=None):
    """Fused reverse chain of ``n_pair`` flow pairs (one whole block when
    n_pair = n_flow/2).  Weight operands carry leading axes
    [n_pair, 2(flow even/odd), ...]; pairs execute in reversed index order
    (the block's inverse).  Each pair consumes 10 rows of margin per side;
    u/v are re-masked outside [0, T) between pairs so the chain is
    numerically identical to n_pair separate kernel launches (which re-read
    zero-padded HBM tiles each time)."""
    g = pl.program_id(0)
    f32 = jnp.float32
    halo = _chain_halo(n_pair)

    dtype = u_out.dtype
    u = _win_cat(ut_ref, uh_ref, halo)  # [win, R_in]; row j = pos j-halo
    v = _win_cat(vt_ref, vh_ref, halo)
    ca = _win_cat(cat_ref, cah_ref, halo)
    cb = _win_cat(cbt_ref, cbh_ref, halo)
    r_in = u.shape[-1]
    tile_start = (g % n_t) * t_tile

    def _idx(w, pi, fi):
        """Index one flow's weight; int8 (wq, wscale) tuples ride along."""
        if w is None:
            return None
        if isinstance(w, tuple):
            return (w[0][pi, fi], w[1][pi, fi])
        return w[pi, fi]

    def flow_w(pi, fi):
        return dict(front_w=front_w[pi, fi], front_b=front_b[pi, fi],
                    kfg=_idx(kfg, pi, fi),
                    cond_w=_idx(cond_w, pi, fi),
                    cond_b=cond_b[pi, fi], res_w=_idx(res_w, pi, fi),
                    res_b=res_b[pi, fi], skip_w=_idx(skip_w, pi, fi),
                    skip_b=skip_b[pi, fi], fin_w=_idx(fin_w, pi, fi),
                    fin_b=fin_b[pi, fi], zw=zw[pi, fi], zb=zb[pi, fi])

    off = 0  # rows consumed per side so far; buffer row 0 = window row off
    for s in range(n_pair):
        i = n_pair - 1 - s          # pair index (reversed execution)
        row0 = tile_start - halo + off  # global position of buffer row 0
        L = u.shape[0]
        l_mid = L - 10
        # couple(odd): u' = u*exp(log_s(v)) + t(v) over buffer rows
        # [5, 5+l_mid)
        net = _coupling_net(v, cb, x_off=5, c_off=off + 5, out_len=l_mid,
                            row0=row0 + 5, T=T, dtype=dtype,
                            c_act_scale=(None if c_row_scale is None
                                         else c_row_scale[1]),
                            **flow_w(i, 1))
        log_s, t = net[:, :r_in], net[:, r_in:]
        u_mid = jax.lax.slice_in_dim(u, 5, 5 + l_mid, axis=0)
        u_mid = u_mid.astype(f32) * jnp.exp(log_s) + t
        # actnorm reverse (odd): v half0, u half1
        v_an = (jax.lax.slice_in_dim(v, 5, 5 + l_mid, axis=0).astype(f32)
                * an_s[i, 1, 0].astype(f32) - an_b[i, 1, 0].astype(f32))
        u_mid = (u_mid * an_s[i, 1, 1].astype(f32)
                 - an_b[i, 1, 1].astype(f32)).astype(dtype)
        # zero u' outside the sequence before couple2's convs consume it
        u_mid = _mask_valid(u_mid, row0 + 5, T)

        # couple(even): v' = v*exp(log_s(u')) + t(u') over [10, L-10)
        l_out = L - 20
        net2 = _coupling_net(u_mid, ca, x_off=5, c_off=off + 10,
                             out_len=l_out, row0=row0 + 10, T=T,
                             dtype=dtype,
                             c_act_scale=(None if c_row_scale is None
                                          else c_row_scale[0]),
                             **flow_w(i, 0))
        log_s2, t2 = net2[:, :r_in], net2[:, r_in:]
        v_new = (jax.lax.slice_in_dim(v_an, 5, 5 + l_out, axis=0)
                 * jnp.exp(log_s2) + t2)
        # actnorm reverse (even): u half0, v half1
        u_fin = (jax.lax.slice_in_dim(u_mid, 5, 5 + l_out, axis=0)
                 .astype(f32)
                 * an_s[i, 0, 0].astype(f32) - an_b[i, 0, 0].astype(f32))
        v_fin = v_new * an_s[i, 0, 1].astype(f32) - an_b[i, 0, 1].astype(f32)
        u = u_fin.astype(dtype)
        v = v_fin.astype(dtype)
        off += 10
        if s < n_pair - 1:
            # the next pair's convs consume u AND v as net inputs: both
            # must be zero outside the sequence (reference zero-pads every
            # conv input; the per-pair path gets this from fresh padded
            # HBM tiles)
            u = _mask_valid(u, row0 + 10, T)
            v = _mask_valid(v, row0 + 10, T)

    extra = halo - 10 * n_pair  # alignment slack: crop to the tile
    uo = jax.lax.slice_in_dim(u, extra, extra + t_tile, axis=0)
    vo = jax.lax.slice_in_dim(v, extra, extra + t_tile, axis=0)
    if u_out.shape[-1] != uo.shape[-1]:  # flat [rows, 128] layout
        u_out[0, 0] = uo.reshape(u_out.shape[-2], u_out.shape[-1])
        v_out[0, 0] = vo.reshape(v_out.shape[-2], v_out.shape[-1])
    else:
        u_out[0, 0] = uo
        v_out[0, 0] = vo


def _pair_kernel_i8(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                    cbt_ref, cbh_ref, front_w, front_b, kfg, cond_w,
                    cond_b, res_w, res_b, skip_w, skip_b, fin_w, fin_b,
                    zw, zb, an_s, an_b, kfg_scale, cond_scale, *rest,
                    t_tile: int, n_t: int, T: int,
                    n_pair: int = 1, has_crs: bool = False):
    """int8 variant: the fg convs AND the conditioning 1x1s run on the
    int8 MXU (weights pre-quantized with per-out-channel scales;
    activations quantized per call).  The res/skip/final matmuls stay
    bf16 — the MAX-ABS-quantized version of them measured slower end to
    end (b128 x 3.83 s: 1158 vs 1049 ms); see _pair_kernel_i8rs for the
    fixed-scale variant that does pay.

    ``has_crs``: an extra [B, 2] SMEM input carries the per-row
    conditioning activation scales (c_a, c_b); each grid step — one
    batch row — reads its own, so serving batches stay
    composition-invariant (see quantize_act)."""
    if has_crs:
        crs_ref, u_out, v_out = rest
        row = pl.program_id(0) // n_t
        crs = (crs_ref[row, 0], crs_ref[row, 1])
    else:
        (u_out, v_out), crs = rest, None
    _pair_kernel(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                 cbt_ref, cbh_ref, front_w, front_b, (kfg, kfg_scale),
                 (cond_w, cond_scale), cond_b, res_w, res_b,
                 skip_w, skip_b, fin_w,
                 fin_b, zw, zb, an_s, an_b, u_out, v_out,
                 t_tile=t_tile, n_t=n_t, T=T, n_pair=n_pair,
                 c_row_scale=crs)


def _pair_kernel_i8rs(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                      cbt_ref, cbh_ref, front_w, front_b, kfg, cond_w,
                      cond_b, res_w, res_b, skip_w, skip_b, fin_w, fin_b,
                      zw, zb, an_s, an_b, kfg_scale, cond_scale,
                      res_scale, skip_scale, *rest, t_tile: int,
                      n_t: int, T: int, n_pair: int = 1,
                      has_crs: bool = False):
    """int8 fg convs + cond 1x1s + res/skip matmuls (FWN_INT8_RS=1 —
    OPT-IN, measured neutral-to-slightly-slower; the shipped default is
    the 17-operand _pair_kernel_i8 without res/skip quantization): the
    res/skip activations are the gate outputs, quantized with the
    FIXED 1/127 scale (_gated_q8 — |tanh*sigmoid| < 1), so unlike the
    rejected max-abs full-int8 variant there is NO extra reduction pass.
    The final 1x1 stays bf16 (its relu-sum input is unbounded)."""
    if has_crs:
        crs_ref, u_out, v_out = rest
        row = pl.program_id(0) // n_t
        crs = (crs_ref[row, 0], crs_ref[row, 1])
    else:
        (u_out, v_out), crs = rest, None
    _pair_kernel(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                 cbt_ref, cbh_ref, front_w, front_b, (kfg, kfg_scale),
                 (cond_w, cond_scale), cond_b, (res_w, res_scale), res_b,
                 (skip_w, skip_scale), skip_b, fin_w,
                 fin_b, zw, zb, an_s, an_b, u_out, v_out,
                 t_tile=t_tile, n_t=n_t, T=T, n_pair=n_pair,
                 c_row_scale=crs)


def _pair_kernel_hoisted_i8(ut_ref, uh_ref, vt_ref, vh_ref, cet_ref,
                            ceh_ref, cot_ref, coh_ref, front_w, front_b,
                            kfg, cond_b, res_w, res_b, skip_w, skip_b,
                            fin_w, fin_b, zw, zb, an_s, an_b, kfg_scale,
                            u_out, v_out, *, t_tile: int, n_t: int,
                            T: int, n_pair: int = 1):
    """Hoisted conditioning + int8 fg convs (deep blocks: the huge cond
    matmuls run OUTSIDE as big-K XLA dots, the fused pair runs fg on the
    int8 MXU)."""
    _pair_kernel(ut_ref, uh_ref, vt_ref, vh_ref, cet_ref, ceh_ref,
                 cot_ref, coh_ref, front_w, front_b, (kfg, kfg_scale),
                 None, cond_b, res_w, res_b, skip_w, skip_b, fin_w,
                 fin_b, zw, zb, an_s, an_b, u_out, v_out,
                 t_tile=t_tile, n_t=n_t, T=T, n_pair=n_pair)


def _pair_kernel_hoisted(ut_ref, uh_ref, vt_ref, vh_ref, cet_ref, ceh_ref,
                         cot_ref, coh_ref, front_w, front_b,
                         kfg, cond_b, res_w, res_b, skip_w, skip_b, fin_w,
                         fin_b, zw, zb, an_s, an_b, u_out, v_out,
                         *, t_tile: int, n_t: int, T: int, n_pair: int = 1):
    """Hoisted-conditioning variant: ce/co are the precomputed per-layer
    conditioning pre-activations (even/odd flow), not raw c."""
    _pair_kernel(ut_ref, uh_ref, vt_ref, vh_ref, cet_ref, ceh_ref, cot_ref,
                 coh_ref, front_w, front_b, kfg,
                 None, cond_b, res_w, res_b, skip_w, skip_b, fin_w, fin_b,
                 zw, zb, an_s, an_b, u_out, v_out,
                 t_tile=t_tile, n_t=n_t, T=T, n_pair=n_pair)


def _wn(p, stacked_axis=None):
    """Effective weight-normalized kernel in fp32 (conv.py:67-71)."""
    v = p["v"].astype(jnp.float32)
    axes = (0, 1) if v.ndim == 3 else (1, 2)
    sq = jnp.sum(v * v, axis=axes, keepdims=True)
    g = p["g"].astype(jnp.float32)
    g = g[:, None, None, :] if v.ndim == 4 else g
    return v * jax.lax.rsqrt(jnp.maximum(sq, 1e-12)) * g


def _flow_operands(fp: dict, dtype):
    """Fold one flow's coupling params into kernel operands (all effective
    weights; biases fp32)."""
    cp = fp["coupling"]
    front_w = _wn(cp["front"]).astype(dtype)              # [3, R_in, R]
    front_b = cp["front"]["b"].astype(jnp.float32)
    kfg, cond_w, cond_b, skip_w, skip_b = [], [], [], [], []
    for layer in cp["layers"]:
        kfg.append(jnp.concatenate(
            [_wn(layer["filter"]), _wn(layer["gate"])], -1).astype(dtype))
        cond_w.append(jnp.concatenate(
            [_wn(layer["filter_c"]), _wn(layer["gate_c"])], -1)[0]
            .astype(dtype))
        cond_b.append(jnp.concatenate(
            [layer["filter"]["b"] + layer["filter_c"]["b"],
             layer["gate"]["b"] + layer["gate_c"]["b"]], -1)
            .astype(jnp.float32))
        skip_w.append(_wn(layer["skip"])[0].astype(dtype))
        skip_b.append(layer["skip"]["b"].astype(jnp.float32))
    res_w = _wn(cp["layers"][0]["res"])[0].astype(dtype)
    res_b = cp["layers"][0]["res"]["b"].astype(jnp.float32)
    fin_w = _wn(cp["final"])[0].astype(dtype)
    fin_b = cp["final"]["b"].astype(jnp.float32)
    ez = jnp.exp(cp["zero"]["scale"].astype(jnp.float32) * 3.0)
    zw = (cp["zero"]["w"][0].astype(jnp.float32) * ez).astype(dtype)
    zb = cp["zero"]["b"].astype(jnp.float32) * ez
    return (front_w, front_b, jnp.stack(kfg), jnp.stack(cond_w),
            jnp.stack(cond_b), res_w, res_b, jnp.stack(skip_w),
            jnp.stack(skip_b), fin_w, fin_b, zw, zb)


def pair_reverse_operands(pair: dict, dtype=jnp.bfloat16):
    """Kernel operands for one flow pair (leaves lead with axis [2]:
    even=0, odd=1, as stacked by _pair_params)."""
    even = jax.tree.map(lambda l: l[0], pair)
    odd = jax.tree.map(lambda l: l[1], pair)
    per_flow = [_flow_operands(even, dtype), _flow_operands(odd, dtype)]
    stacked = [jnp.stack([a, b]) for a, b in zip(*per_flow)]

    def an_halves(fp):
        logs3 = fp["actnorm"]["logs"].astype(jnp.float32)[0, 0] * 3.0
        b = fp["actnorm"]["b"].astype(jnp.float32)[0, 0]
        c2 = logs3.shape[0] // 2
        s = jnp.exp(-logs3)
        return (jnp.stack([s[:c2], s[c2:]]), jnp.stack([b[:c2], b[c2:]]))

    an_e, an_o = an_halves(even), an_halves(odd)
    an_s = jnp.stack([an_e[0], an_o[0]])    # [flow, half, R_in]
    an_b = jnp.stack([an_e[1], an_o[1]])
    return tuple(stacked) + (an_s, an_b)


# operand index of cond_w in pair_reverse_operands output (see the order
# table above _WEIGHT_OPERANDS at the bottom of this file)
_COND_W_IDX = 3


def _quant_w(w, reduce_axes):
    """Per-out-channel int8 weight quantization: (wq, fp32 scales) with
    max-abs over ``reduce_axes`` (the non-out axes)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, reduce_axes)),
                  -127.0, 127.0).astype(jnp.int8)
    return wq, scale


def pair_reverse_operands_int8(pair: dict, dtype=jnp.bfloat16,
                               c_scales=None):
    """Operands for the int8 direct kernel: the fg convs, the
    conditioning 1x1s, and (with FWN_INT8_RS=1 — opt-in, off by
    default) the res/skip matmuls are quantized to int8 with
    per-(flow, [layer,] out-channel) scales APPENDED (in that order)
    after an_b.  The res/skip activations
    are the gate outputs, quantized in-kernel with the FIXED 1/127 scale
    (_gated_q8) — no extra reduction pass, which is why this pays where
    the max-abs full-int8 variant measured slower.  The front conv, the
    final 1x1 (its input is an unbounded relu sum), and the zero conv
    (whose output IS log_s/t) stay high-precision.

    ``c_scales=(s_a, s_b)``: the conditioning halves arrive PRE-quantized
    (int8 tiles) with these global activation scales; fold them into the
    cond weight scales (even flows consume c_a, odd flows c_b) so the
    kernel's dequant multiply needs no extra operand."""
    ops = list(pair_reverse_operands(pair, dtype))
    scales = []
    # kfg [2, nl, 3, Cin, 2R] -> scales [2, nl, 2R]
    ops[2], s = _quant_w(ops[2], (2, 3))
    scales.append(s)
    # cond_w [2, nl, Cc, 2R] -> [2, nl, 2R]
    ops[_COND_W_IDX], s = _quant_w(ops[_COND_W_IDX], (2,))
    if c_scales is not None:
        s = s * jnp.stack([jnp.asarray(cs, jnp.float32)
                           for cs in c_scales])[:, None, None]
    scales.append(s)
    if INT8_RS:
        # res_w [2, R, R] -> [2, R]; skip_w [2, nl, R, R] -> [2, nl, R]
        ops[5], s = _quant_w(ops[5], (1,))
        scales.append(s)
        ops[7], s = _quant_w(ops[7], (2,))
        scales.append(s)
    return tuple(ops) + tuple(scales)


def pair_reverse_operands_hoisted_int8(pair: dict, dtype=jnp.bfloat16):
    """Hoisted-conditioning operands with int8 fg convs ONLY (res/skip/
    final stay bf16; the cond matmuls run outside in bf16), for
    _pair_kernel_hoisted_i8."""
    ops, hoist = pair_reverse_operands_hoisted(pair, dtype)
    ops = list(ops)
    ops[2], s = _quant_w(ops[2], (2, 3))      # kfg
    return tuple(ops) + (s,), hoist


def pair_reverse_operands_hoisted(pair: dict, dtype=jnp.bfloat16):
    """Kernel operands for the HOISTED-conditioning pair kernel (deep
    blocks: cond weights exceed VMEM, so the cond matmuls run outside).

    Returns (operands, (w_even, w_odd)): ``operands`` excludes cond_w;
    w_flow is the [Cc, n_layer*2R] hoist weight (layer0 || layer1 on the
    output axis) to apply as ``c_half @ w_flow`` OUTSIDE the kernel.
    """
    ops = list(pair_reverse_operands(pair, dtype))
    cond_w = ops.pop(_COND_W_IDX)              # [2(flow), n_layer, Cc, 2R]
    n_layer = cond_w.shape[1]
    hoist = jnp.concatenate([cond_w[:, l] for l in range(n_layer)], axis=-1)
    return tuple(ops), (hoist[0], hoist[1])


def _tiles_and_halos(x, t_tile: int, n_t: int, T_pad: int, halo: int):
    """Non-overlapping tiles (a free reshape VIEW of x) + per-tile halo
    slivers [B, n_t, 2*halo, C] (a ~2*halo/t_tile-sized copy).

    Replaces overlapping-window materialization: the kernel concatenates
    [left-halo | tile | right-halo] in VMEM.  Requires t_tile >= halo and
    t_tile % halo-alignment handled by callers."""
    B, T, C = x.shape
    xp = x if T == T_pad else jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    tiles = xp.reshape(B, n_t, t_tile, C)
    z = jnp.zeros((B, 1, halo, C), x.dtype)
    if n_t > 1:
        lefts = jnp.concatenate(
            [z, tiles[:, :-1, t_tile - halo:, :]], axis=1)
        rights = jnp.concatenate([tiles[:, 1:, :halo, :], z], axis=1)
    else:
        lefts = rights = z
    return tiles, jnp.concatenate([lefts, rights], axis=2)


def _plane_halos(v, hr: int):
    """Halo slivers [B, n_t, P, 2*hr, (nb,) C] for plane-ified tiles v
    (works on both plain 5-D and batch-packed 6-D layouts — the plane-row
    axis is 3 in both)."""
    n_t = v.shape[1]
    z = jnp.zeros((v.shape[0], 1, v.shape[2], hr) + v.shape[4:], v.dtype)
    if n_t > 1:
        lefts = jnp.concatenate([z, v[:, :-1, :, -hr:]], axis=1)
        rights = jnp.concatenate([v[:, 1:, :, :hr], z], axis=1)
    else:
        lefts = rights = z
    return jnp.concatenate([lefts, rights], axis=3)


def _tiles_and_halos_wino(x, t_tile: int, n_t: int, T_pad: int, P: int,
                          halo: int, nb: int = 1):
    """Plane de-interleaved tiles [B(/nb), n_t, P, t_tile/P, (nb,) C] (one
    transpose) + halo slivers [.., 2*halo/P, (nb,) C].  Phase alignment
    holds because t_tile % P == 0 and halo % P == 0 (global phase ==
    tile-local phase).  ``nb``: batch packing — nb consecutive batch items
    share each plane row (kernel matmul M becomes rows*nb)."""
    B, T, C = x.shape
    xp = x if T == T_pad else jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    if nb == 1:
        v = xp.reshape(B, n_t, t_tile // P, P, C)
        v = jnp.transpose(v, (0, 1, 3, 2, 4))    # [B, n_t, P, tt/P, C]
    else:
        v = xp.reshape(B // nb, nb, n_t, t_tile // P, P, C)
        v = jnp.transpose(v, (0, 2, 4, 3, 1, 5))  # [Bc,n_t,P,tt/P,nb,C]
    return v, _plane_halos(v, halo // P)


def _fit_tile(T: int, base: int, align: int, min_tile: int):
    """(t_tile, n_t, T_pad): prefer a tile that DIVIDES T (the tile view
    is then free — no jnp.pad full-tensor copy, measured 42 ms at the
    bench shape); fall back to ceil-based padding geometry."""
    n0 = max(1, -(-T // base))
    for n in range(n0, n0 + 8):
        tt = T // n
        if tt < min_tile:
            break
        if T % n == 0 and tt % align == 0:
            return tt, n, T
    tt = max(min_tile, min(base, -(-T // align) * align))
    n = -(-T // tt)
    return tt, n, n * tt


def _wino_geometry(T: int, P: int, n_pair: int = 1):
    """(t_tile, n_t, T_pad) for the Winograd kernels at level length T.
    ``n_pair``: chain length — tiles must hold at least the chain's halo
    (6 plane rows per pair per side)."""
    base_tile = WINO_T_TILE if P == 6 else WINO4_T_TILE
    min_tile = -(-(6 * P * n_pair) // 48) * 48
    return _fit_tile(T, base_tile, 48, min_tile)


def wino_cond_tiles(c_half, k: int, P: int, n_pair: int = 1, nb: int = 1):
    """Level-k conditioning tiles+halos for the Winograd kernels, built
    DIRECTLY from the (half-)mel tensor in one transpose.

    Equivalent to _tiles_and_halos_wino(squeeze_to_level(c_half, k), ...)
    but fuses the level extraction and the plane de-interleave, and runs
    once per block (c is pair-constant) instead of per pair.  Time index
    algebra: t0 = 2^k*(tile*tt + P*j + q) + delta, target channel
    2^k*m + bitrev(delta).  ``n_pair`` sizes the halo for chain kernels;
    ``nb`` batch-packs nb items per plane row (same single transpose)."""
    B, T0, C0 = c_half.shape
    Tk = T0 >> k
    t_tile, n_t, T_pad = _wino_geometry(Tk, P, n_pair)
    rows = t_tile // P
    if T_pad != Tk:
        c_half = jnp.pad(
            c_half, ((0, 0), (0, (T_pad - Tk) << k), (0, 0)))
    if nb == 1:
        v = c_half.reshape((B, n_t, rows, P) + (2,) * k + (C0,))
        # axes: 0 B, 1 n_t, 2 j(rows), 3 q(P), 4..3+k delta bits
        # (MSB..LSB), 4+k C0.  Target: [B, n_t, q, j, m, p1..pk].
        perm = (0, 1, 3, 2, 4 + k) + tuple(range(3 + k, 3, -1))
        v = v.transpose(perm).reshape(B, n_t, P, rows, C0 << k)
    else:
        v = c_half.reshape((B // nb, nb, n_t, rows, P) + (2,) * k + (C0,))
        # axes: 0 Bc, 1 nb, 2 n_t, 3 j, 4 q, 5..4+k bits, 5+k C0.
        # Target: [Bc, n_t, q, j, nb, m, p1..pk].
        perm = (0, 2, 4, 3, 1, 5 + k) + tuple(range(4 + k, 4, -1))
        v = v.transpose(perm).reshape(B // nb, n_t, P, rows, nb, C0 << k)
    return v, _plane_halos(v, 6 * n_pair)


def stack_chain_operands(per_pair_ops: list[tuple]) -> tuple:
    """Stack per-pair operand tuples (from pair_reverse_operands*) on a new
    leading n_pair axis for the chain kernels."""
    return tuple(jnp.stack(parts) for parts in zip(*per_pair_ops))


def fused_chain_reverse(u, v, c_a, c_b, operands, *, n_pair: int,
                        t_tile: int | None = None, interpret: bool = False,
                        hoisted: bool = False, int8: bool = False,
                        c_row_scales=None):
    """Apply a chain of ``n_pair`` reverse flow pairs (one whole block) in
    ONE kernel launch.  u, v: [B, T, R_in]; c_*: [B, T, Cc]; ``operands``
    from stack_chain_operands (leading axes [n_pair, 2, ...]).  Returns
    (u', v').  Relative to n_pair separate launches this reads u, v and
    both c halves from HBM once instead of n_pair times and deletes the
    intermediate u/v round trips.

    ``hoisted=True``: c_a/c_b are the precomputed conditioning
    pre-activations for the even/odd flow ([B, T, n_layer*2R], from
    pair_reverse_operands_hoisted's hoist weights) and ``operands`` excludes
    cond_w.

    ``c_row_scales`` (int8 + pre-quantized c only): [B, 2] fp32 PER-ROW
    conditioning activation scales (c_a, c_b), delivered to each grid
    step — which carries exactly one batch row — through a tiny SMEM
    block.  Per-row instead of per-tensor scales keep every batch row's
    int8 codes independent of its companions (serving's
    batch-composition-invariance; see conv.quantize_act)."""
    B, T, R_in = u.shape
    dtype = u.dtype
    halo = _chain_halo(n_pair)
    if t_tile is None:
        t_tile = direct_t_tile(int8)
    t_tile, n_t, T_pad = _fit_tile(T, t_tile, 16, halo)

    ut, uh = _tiles_and_halos(u, t_tile, n_t, T_pad, halo)
    vt, vh = _tiles_and_halos(v, t_tile, n_t, T_pad, halo)
    # Flat u/v layout: refold each tile's t_tile*R_in values to a DENSE
    # [rows, 128] view (no 128/R_in lane padding).  Mosaic requires the
    # block's trailing dims be (8,128)-divisible OR equal to the array
    # dims — the whole-tile block satisfies the latter exactly, so the
    # refold only needs t_tile*R_in % 128 == 0.  R_in >= 128 is already
    # dense; the kernel pays a small in-VMEM relayout per tile instead
    # of the HBM-side padded tile-view copies.
    flat = FLAT_UV and R_in < 128 and (t_tile * R_in) % 128 == 0
    if flat:
        rows128 = t_tile * R_in // 128
        ut = ut.reshape(B, n_t, rows128, 128)
        vt = vt.reshape(B, n_t, rows128, 128)
    cat, cah = _tiles_and_halos(c_a, t_tile, n_t, T_pad, halo)
    cbt, cbh = _tiles_and_halos(c_b, t_tile, n_t, T_pad, halo)
    Cc = c_a.shape[-1]

    if hoisted:
        kern = _pair_kernel_hoisted_i8 if int8 else _pair_kernel_hoisted
    elif int8:
        # 19 operands = fg/cond/res/skip scales appended (INT8_RS),
        # 17 = fg/cond only (FWN_INT8_RS=0)
        kern = _pair_kernel_i8rs if len(operands) == 19 else _pair_kernel_i8
    else:
        kern = _pair_kernel
    kw = {}
    if c_row_scales is not None:
        assert int8 and not hoisted, "c_row_scales is an int8-route input"
        kw["has_crs"] = True
    kernel = functools.partial(kern, t_tile=t_tile, n_t=n_t, T=T,
                               n_pair=n_pair, **kw)
    grid = (B * n_t,)

    def in_map(g):
        return (g // n_t, g % n_t, 0, 0)

    def out_map(g):
        return (g // n_t, g % n_t, 0)

    def tile_spec(C):
        return pl.BlockSpec((1, 1, t_tile, C), in_map,
                            memory_space=pltpu.VMEM)

    def halo_spec(C):
        return pl.BlockSpec((1, 1, 2 * halo, C), in_map,
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    extra_in, extra_specs = (), []
    if c_row_scales is not None:
        # whole [B, 2] array in SMEM (tiny); the kernel indexes its own
        # row — Mosaic rejects sub-(8, 128) BLOCKS but not full arrays
        extra_in = (jnp.asarray(c_row_scales, jnp.float32),)
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    cond_flops = 0 if hoisted else 2 * Cc * 512
    flops_net = 2 * T * (2 * 3 * 256 * 512 + cond_flops + 2 * 256 * 256
                         + 256 * 256 + 3 * R_in * 256 + 256 * 2 * R_in)
    def uv_tile_spec():
        if flat:
            return pl.BlockSpec((1, 1, rows128, 128), in_map,
                                memory_space=pltpu.VMEM)
        return tile_spec(R_in)

    uv_shape = (B, n_t, rows128, 128) if flat \
        else (B, n_t, t_tile, R_in)
    u2, v2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            uv_tile_spec(), halo_spec(R_in),
            uv_tile_spec(), halo_spec(R_in),
            tile_spec(Cc), halo_spec(Cc),
            tile_spec(Cc), halo_spec(Cc),
        ] + [wspec] * len(operands) + extra_specs,
        out_specs=[uv_tile_spec(), uv_tile_spec()],
        out_shape=[jax.ShapeDtypeStruct(uv_shape, dtype)] * 2,
        # u/v tiles alias the outputs: the early blocks' tiny channel
        # counts (R_in = 1..16) force the custom call's tiled layout to
        # pad lanes up to 128x, so each of these four buffers is ~3.3 GB
        # at the b128 x 9.76 s bench shape (26 MB of data!) — aliasing
        # halves that, which is what un-OOMs long clips (tools/
        # hbm_audit.py).  Safe: each grid step reads only its own tile
        # (+ separately-copied halo slivers) before writing it.
        input_output_aliases={0: 0, 2: 1},
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pair * flops_net,
            bytes_accessed=(ut.size + vt.size + cat.size + cbt.size
                            + 2 * B * T_pad * R_in) * dtype.itemsize,
            transcendentals=2 * B * T * n_pair * 512 * 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if _GRID_ARBITRARY
            else ("parallel",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ut, uh, vt, vh, cat, cah, cbt, cbh, *operands, *extra_in)
    u2 = u2.reshape(B, T_pad, R_in)
    v2 = v2.reshape(B, T_pad, R_in)
    if T_pad != T:
        u2, v2 = u2[:, :T], v2[:, :T]
    return u2, v2


def fused_pair_reverse(u, v, c_a, c_b, operands, *, t_tile: int = 1024,
                       interpret: bool = False, hoisted: bool = False,
                       int8: bool = False, c_row_scales=None):
    """Apply one reverse flow pair. u, v: [B, T, R_in]; c_*: [B, T, Cc].
    ``operands`` from pair_reverse_operands.  Returns (u', v').
    Single-pair special case of fused_chain_reverse."""
    return fused_chain_reverse(u, v, c_a, c_b,
                               stack_chain_operands([operands]),
                               n_pair=1, t_tile=t_tile, interpret=interpret,
                               hoisted=hoisted, int8=int8,
                               c_row_scales=c_row_scales)


# ===========================================================================
# Winograd F(2,3) variant: 6-phase de-interleaved planes.
#
# The two fused filter|gate convs (k=3, dilations 1 and 3) carry ~74% of the
# model's FLOPs.  F(2,3) computes 2 outputs with 4 multiplies instead of 6 —
# a 1.5x FLOP cut on those convs (~25% model-wide).  The classic obstacle on
# TPU is the even/odd (and per-dilation-phase) data access; storing every
# intermediate as SIX phase planes P_r[j] = x[6j + r] makes all Winograd
# taps FULL-SUBLANE shifted slices for BOTH dilations:
#   d=1 output pairs (r, r+1), r in {0,2,4}: taps at offsets -1,0,1,2
#   d=3 output pairs (r, r+3), r in {0,1,2}: taps at offsets -3,0,3,6
# and an offset o from plane r lands wholly in plane (r+o) % 6 with a +-1
# plane-row shift.  De-interleave/re-interleave happen OUTSIDE the kernel
# (one cheap XLA transpose per input/output).
#
# Region bookkeeping is in plane rows (6 samples each).  Each conv stage
# consumes at most +-1 plane row, and the fused pair chains 6 conv stages,
# so a 6-plane-row halo (WINO_HALO=36 samples) suffices:
#   couple1: h0 @ [1,Lp-1) -> gated0/h1 @ [2,Lp-2) -> net/u_mid @ [3,Lp-3)
#   couple2: h0' @ [4,Lp-4) -> gated0'/h1' @ [5,Lp-5) -> out @ [6,Lp-6)
# With t_tile=960 (divisible by 48 so tile starts preserve phase), the
# window is 1032 samples = 172 plane rows and the output region is exactly
# 160 plane rows = t_tile.
# ===========================================================================

WINO_T_TILE = _env_int("FWN_WINO_TT", 960, multiple_of=48)
WINO_HALO = 36

# F(4,3) (12-phase) variant: 6 multiplies per 4 outputs = 2x fewer MXU
# FLOPs than direct on the filter|gate convs (vs F(2,3)'s 1.5x).  Same
# plane trick with TWELVE phases so both 4-output tiles of d=1 (r..r+3)
# and d=3 (r, r+3, r+6, r+9) stay full-sublane shifted slices.  The chain
# still consumes +-1 plane row per conv stage, but plane rows are 12
# samples, so the halo is 72 samples.
WINO4_T_TILE = _env_int("FWN_WINO4_TT", 1920, multiple_of=48)
WINO4_HALO = 72


def _wino_weights(w):
    """G-transform 3-tap kernels: [..., 3, Cin, Cout] -> [..., 4, Cin, Cout]
    with U = (W0, (W0+W1+W2)/2, (W0-W1+W2)/2, W2)."""
    w0 = w[..., 0, :, :]
    w1 = w[..., 1, :, :]
    w2 = w[..., 2, :, :]
    return jnp.stack([w0, (w0 + w1 + w2) * 0.5, (w0 - w1 + w2) * 0.5, w2],
                     axis=-3)


def _wino4_weights(w):
    """F(4,3) G-transform (Lavin & Gray): [..., 3, Cin, Cout] ->
    [..., 6, Cin, Cout]."""
    w0 = w[..., 0, :, :]
    w1 = w[..., 1, :, :]
    w2 = w[..., 2, :, :]
    return jnp.stack([
        w0 * 0.25,
        (-w0 - w1 - w2) * (1.0 / 6.0),
        (-w0 + w1 - w2) * (1.0 / 6.0),
        w0 * (1.0 / 24.0) + w1 * (1.0 / 12.0) + w2 * (1.0 / 6.0),
        w0 * (1.0 / 24.0) - w1 * (1.0 / 12.0) + w2 * (1.0 / 6.0),
        w2,
    ], axis=-3)


def _tap(planes, a_vals: int, r: int, off: int, a_out: int, L: int,
         nb: int = 1):
    """Rows at global window offset (P*j + r + off) for output plane rows
    j in [a_out, a_out+L), from planes stored with region start a_vals.

    ``nb``: batch-packing factor — each plane row holds nb batch items
    back to back ([rows*nb, C] flattened storage), so row indices scale by
    nb and every tap's matmul M becomes L*nb."""
    P = len(planes)
    q = (r + off) % P
    s = (r + off - q) // P
    rel = a_out + s - a_vals
    return jax.lax.slice_in_dim(planes[q], rel * nb, (rel + L) * nb, axis=0)


def _conv3_wino_pairs(planes, a_vals: int, U, *, step: int, a_out: int,
                      L: int, nb: int = 1):
    """Winograd F(2,3) for all 6 output planes of a 3-tap conv with
    dilation ``step`` (1 or 3).  U: [4, Cin, Cout].  Returns a list of 6
    fp32 [L*nb, Cout] planes at region start a_out.

    (Measured: per-plane [L,Cin] matmuls beat concatenating the pairs into
    [3L,Cin] big-M matmuls — the in-VMEM concats/reshapes cost more than
    the MXU efficiency they buy: block0 572 vs 423 ms.  Batch packing
    ``nb`` raises M without any copy: consecutive batch items live in
    consecutive sublanes of the same plane.)
    """
    outs = [None] * 6
    pairs = [(0, 1), (2, 3), (4, 5)] if step == 1 else [(0, 3), (1, 4),
                                                        (2, 5)]
    for r0, r1 in pairs:
        d0 = _tap(planes, a_vals, r0, -step, a_out, L, nb)
        d1 = _tap(planes, a_vals, r0, 0, a_out, L, nb)
        d2 = _tap(planes, a_vals, r0, step, a_out, L, nb)
        d3 = _tap(planes, a_vals, r0, 2 * step, a_out, L, nb)
        m0 = jnp.dot(d0 - d2, U[0], preferred_element_type=ACC_DTYPE)
        m1 = jnp.dot(d1 + d2, U[1], preferred_element_type=ACC_DTYPE)
        m2 = jnp.dot(d2 - d1, U[2], preferred_element_type=ACC_DTYPE)
        m3 = jnp.dot(d1 - d3, U[3], preferred_element_type=ACC_DTYPE)
        outs[r0] = m0 + m1 + m2
        outs[r1] = m1 - m2 - m3
    return outs


def _conv3_wino4_groups(planes, a_vals: int, U, *, step: int, a_out: int,
                        L: int, nb: int = 1):
    """Winograd F(4,3) over 12 phase planes: 6 multiplies per 4 outputs.
    U: [6, Cin, Cout] from _wino4_weights.  Returns 12 fp32 [L*nb, Cout]
    planes at region start a_out.

    d=1 output tiles: (0..3), (4..7), (8..11); d=3: (r, r+3, r+6, r+9)."""
    outs = [None] * 12
    groups = ([(0, 1, 2, 3), (4, 5, 6, 7), (8, 9, 10, 11)] if step == 1
              else [(0, 3, 6, 9), (1, 4, 7, 10), (2, 5, 8, 11)])
    for grp in groups:
        r0 = grp[0]
        d = [_tap(planes, a_vals, r0, (k - 1) * step, a_out, L, nb)
             for k in range(6)]
        # BT d (input transform; integer coefficients, VPU adds/shifts)
        t0 = 4.0 * d[0] - 5.0 * d[2] + d[4]
        t1 = -4.0 * (d[1] + d[2]) + d[3] + d[4]
        t2 = 4.0 * (d[1] - d[2]) - d[3] + d[4]
        t3 = -2.0 * d[1] - d[2] + 2.0 * d[3] + d[4]
        t4 = 2.0 * d[1] - d[2] - 2.0 * d[3] + d[4]
        t5 = 4.0 * d[1] - 5.0 * d[3] + d[5]
        m = [jnp.dot(t, U[k], preferred_element_type=ACC_DTYPE)
             for k, t in enumerate((t0, t1, t2, t3, t4, t5))]
        # AT m (output transform)
        outs[grp[0]] = m[0] + m[1] + m[2] + m[3] + m[4]
        outs[grp[1]] = m[1] - m[2] + 2.0 * (m[3] - m[4])
        outs[grp[2]] = m[1] + m[2] + 4.0 * (m[3] + m[4])
        outs[grp[3]] = m[1] - m[2] + 8.0 * (m[3] - m[4]) + m[5]
    return outs


def _conv3_front_planes(planes, a_vals: int, w, *, a_out: int, L: int,
                        nb: int = 1):
    """Direct 3-tap d=1 conv for the tiny-Cin front layer, per plane."""
    cin = planes[0].shape[-1]
    outs = []
    for r in range(len(planes)):
        acc = None
        for k in range(3):
            tap = _tap(planes, a_vals, r, k - 1, a_out, L, nb)
            if cin >= 8:
                o = jnp.dot(tap, w[k], preferred_element_type=ACC_DTYPE)
            else:
                o = None
                for c in range(cin):
                    t_ = (tap[:, c:c + 1].astype(ACC_DTYPE)
                          * w[k][c].astype(ACC_DTYPE)[None, :])
                    o = t_ if o is None else o + t_
            acc = o if acc is None else acc + o
        outs.append(acc)
    return outs


def _mask_planes(planes, a: int, row0_win, T: int, nb: int = 1):
    """Zero plane rows whose global position is outside [0, T).
    row0_win = global position of window row 0 (traced scalar).
    With batch packing (nb > 1) each group of nb consecutive storage rows
    shares one time position."""
    if _NO_MASK:
        return list(planes)
    P = len(planes)
    out = []
    for r, x in enumerate(planes):
        j = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
        if nb > 1:
            j = j // nb
        pos = row0_win + P * a + r + P * j
        out.append(jnp.where((pos >= 0) & (pos < T), x, jnp.zeros_like(x)))
    return out


def _coupling_net_wino(x_pl, x_a: int, c_pl, *, a_h0: int, row0_win,
                       T: int,
                       front_w, front_b, kfg, cond_w, cond_b, res_w, res_b,
                       skip_w, skip_b, fin_w, fin_b, zw, zb, dtype,
                       nb: int = 1):
    """Plane-space coupling net.  x_pl: P planes at region start x_a;
    c_pl: P conditioning planes at region start 0 (full window).
    Returns P fp32 net-output planes (log_s || t) at region a_h0 + 2.

    P (6 or 12) and the Winograd variant are inferred from the shapes:
    kfg[l] has 4 G-transformed taps for F(2,3), 6 for F(4,3).
    ``cond_w=None`` = hoisted conditioning: c_pl holds the precomputed
    per-layer pre-activations (layer0 || layer1 on channels).
    ``nb``: batch-packing factor — planes store nb batch items per plane
    row ([rows*nb, C]), scaling every matmul's M by nb."""
    acc = ACC_DTYPE
    P = len(x_pl)
    conv = _conv3_wino_pairs if kfg.shape[1] == 4 else _conv3_wino4_groups
    w2r = kfg.shape[-1]
    Lp = c_pl[0].shape[0] // nb
    a0, a1, a2 = a_h0, a_h0 + 1, a_h0 + 2
    L0, L1, L2 = Lp - 2 * a0, Lp - 2 * a1, Lp - 2 * a2

    h0 = _conv3_front_planes(x_pl, x_a, front_w, a_out=a0, L=L0, nb=nb)
    h0 = [jnp.maximum(h + front_b.astype(acc), 0.0).astype(dtype)
          for h in h0]
    h0 = _mask_planes(h0, a0, row0_win, T, nb)

    # layer 0 (d=1)
    fg0 = conv(h0, a0, kfg[0], step=1, a_out=a1, L=L1, nb=nb)
    r = fg0[0].shape[-1] // 2
    rs_w = jnp.concatenate([res_w, skip_w[0]], axis=-1)
    sk0_pl, h1 = [], []
    for q in range(P):
        c_sl = jax.lax.slice_in_dim(c_pl[q], a1 * nb, (a1 + L1) * nb,
                                    axis=0)
        if cond_w is None:
            fg = fg0[q] + c_sl[:, :w2r].astype(acc)
        else:
            fg = fg0[q] + jnp.dot(c_sl, cond_w[0],
                                  preferred_element_type=acc)
        fg = fg + cond_b[0].astype(acc)
        g = _gated(fg, r, dtype)
        rs = jnp.dot(g, rs_w, preferred_element_type=acc)
        sk0_pl.append(rs[:, r:])
        res0 = rs[:, :r]
        h0_mid = jax.lax.slice_in_dim(h0[q], nb, nb + L1 * nb, axis=0)
        h1.append(((h0_mid.astype(acc) + res0 + res_b.astype(acc))
                   * SQRT_HALF).astype(dtype))
    h1 = _mask_planes(h1, a1, row0_win, T, nb)

    # layer 1 (d=3)
    fg1 = conv(h1, a1, kfg[1], step=3, a_out=a2, L=L2, nb=nb)
    net = []
    for q in range(P):
        c_sl = jax.lax.slice_in_dim(c_pl[q], a2 * nb, (a2 + L2) * nb,
                                    axis=0)
        if cond_w is None:
            fg = fg1[q] + c_sl[:, w2r:].astype(acc)
        else:
            fg = fg1[q] + jnp.dot(c_sl, cond_w[1],
                                  preferred_element_type=acc)
        fg = fg + cond_b[1].astype(acc)
        g1 = _gated(fg, r, dtype)
        sk0 = jax.lax.slice_in_dim(sk0_pl[q], nb, nb + L2 * nb, axis=0)
        sk = (sk0 + skip_b[0].astype(acc)
              + jnp.dot(g1, skip_w[1], preferred_element_type=acc)
              + skip_b[1].astype(acc))
        out = jnp.maximum(sk, 0.0).astype(dtype)
        out = jnp.dot(out, fin_w, preferred_element_type=acc)
        out = jnp.maximum(out + fin_b.astype(acc), 0.0).astype(dtype)
        # fp32 for the downstream affine exp/update regardless of ACC_DTYPE
        net.append(jnp.dot(out, zw, preferred_element_type=jnp.float32)
                   + zb.astype(jnp.float32))
    return net


def _win_cat_planes(tile_ref, halo_ref, P: int, hr: int, nb: int = 1):
    """Per-phase [left-halo | tile | right-halo] planes from plane-ified
    tile + halo refs ([1, 1, P, rows, C] or batch-packed
    [1, 1, P, rows, nb, C] — packed refs are flattened to [rows*nb, C],
    a free collapse of adjacent dims)."""
    out = []
    for q in range(P):
        t = tile_ref[0, 0, q]
        h = halo_ref[0, 0, q]
        if t.ndim == 3:  # packed: [rows, nb, C] -> [rows*nb, C]
            t = t.reshape(t.shape[0] * t.shape[1], t.shape[2])
            h = h.reshape(h.shape[0] * h.shape[1], h.shape[2])
        out.append(jnp.concatenate(
            [h[:hr * nb], t, h[hr * nb:]], axis=0))
    return out


def _pair_kernel_wino(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                      cbt_ref, cbh_ref, front_w, front_b, kfg,
                      cond_w, cond_b, res_w, res_b, skip_w, skip_b, fin_w,
                      fin_b, zw, zb, an_s, an_b, u_out, v_out,
                      *, t_tile: int, n_t: int, T: int, n_pair: int = 1,
                      nb: int = 1):
    """Fused Winograd reverse chain of ``n_pair`` flow pairs (one whole
    block when n_pair = n_flow/2).  Weight operands carry leading axes
    [n_pair, 2(flow even/odd), ...]; pairs execute in reversed index order.
    Each pair consumes 6 plane rows of margin per side (3 per coupling);
    u/v planes are re-masked outside [0, T) between pairs so the chain is
    numerically identical to n_pair separate launches.

    ``nb``: batch-packing — refs carry nb batch items per plane row
    ([.., P, rows, nb, C]); planes flatten to [rows*nb, C] so every matmul
    runs at M = rows*nb without any in-VMEM copy."""
    g = pl.program_id(0)
    f32 = jnp.float32
    dtype = u_out.dtype
    P = ut_ref.shape[2]                # phase planes: 6=F(2,3), 12=F(4,3)
    hr = 6 * n_pair                    # halo plane rows each side
    halo = hr * P
    row0_win = (g % n_t) * t_tile - halo

    u_pl = _win_cat_planes(ut_ref, uh_ref, P, hr, nb)
    v_pl = _win_cat_planes(vt_ref, vh_ref, P, hr, nb)
    ca_pl = _win_cat_planes(cat_ref, cah_ref, P, hr, nb)
    cb_pl = _win_cat_planes(cbt_ref, cbh_ref, P, hr, nb)
    r_in = u_pl[0].shape[-1]
    Lp = u_pl[0].shape[0] // nb

    def flow_w(pi, fi):
        return dict(front_w=front_w[pi, fi], front_b=front_b[pi, fi],
                    kfg=kfg[pi, fi],
                    cond_w=None if cond_w is None else cond_w[pi, fi],
                    cond_b=cond_b[pi, fi], res_w=res_w[pi, fi],
                    res_b=res_b[pi, fi], skip_w=skip_w[pi, fi],
                    skip_b=skip_b[pi, fi], fin_w=fin_w[pi, fi],
                    fin_b=fin_b[pi, fi], zw=zw[pi, fi], zb=zb[pi, fi])

    a = 0  # current region start (plane rows); u_pl/v_pl valid there
    for s in range(n_pair):
        i = n_pair - 1 - s             # pair index (reversed execution)
        # couple(odd): u' = u*exp(log_s(v)) + t(v) at region a+3
        net = _coupling_net_wino(v_pl, a, cb_pl, a_h0=a + 1,
                                 row0_win=row0_win, T=T, dtype=dtype,
                                 nb=nb, **flow_w(i, 1))
        a_mid, L_mid = a + 3, Lp - 2 * (a + 3)
        u_mid = []
        for q in range(P):
            n_q = net[q]
            u_sl = jax.lax.slice_in_dim(u_pl[q], (a_mid - a) * nb,
                                        (a_mid - a + L_mid) * nb, axis=0)
            um = (u_sl.astype(f32) * jnp.exp(n_q[:, :r_in])
                  + n_q[:, r_in:])
            # actnorm reverse (odd), u half1
            um = um * an_s[i, 1, 1].astype(f32) - an_b[i, 1, 1].astype(f32)
            u_mid.append(um.astype(dtype))
        u_mid = _mask_planes(u_mid, a_mid, row0_win, T, nb)

        # couple(even): v' = v*exp(log_s(u')) + t(u') at region a+6
        net2 = _coupling_net_wino(u_mid, a_mid, ca_pl, a_h0=a + 4,
                                  row0_win=row0_win, T=T, dtype=dtype,
                                  nb=nb, **flow_w(i, 0))
        a_out, L_out = a + 6, Lp - 2 * (a + 6)
        new_u, new_v = [], []
        for q in range(P):
            v_sl = jax.lax.slice_in_dim(v_pl[q], (a_out - a) * nb,
                                        (a_out - a + L_out) * nb, axis=0)
            v_an = (v_sl.astype(f32) * an_s[i, 1, 0].astype(f32)
                    - an_b[i, 1, 0].astype(f32))
            n_q = net2[q]
            v_new = v_an * jnp.exp(n_q[:, :r_in]) + n_q[:, r_in:]
            v_fin = (v_new * an_s[i, 0, 1].astype(f32)
                     - an_b[i, 0, 1].astype(f32))
            u_sl = jax.lax.slice_in_dim(u_mid[q], 3 * nb,
                                        (3 + L_out) * nb, axis=0)
            u_fin = (u_sl.astype(f32) * an_s[i, 0, 0].astype(f32)
                     - an_b[i, 0, 0].astype(f32))
            new_u.append(u_fin.astype(dtype))
            new_v.append(v_fin.astype(dtype))
        if s < n_pair - 1:
            # the next pair's convs consume both u and v: zero them
            # outside the sequence (per-pair launches get this from fresh
            # zero-padded HBM tiles)
            new_u = _mask_planes(new_u, a_out, row0_win, T, nb)
            new_v = _mask_planes(new_v, a_out, row0_win, T, nb)
        u_pl, v_pl, a = new_u, new_v, a_out

    for q in range(P):
        if nb > 1:
            rows = u_out.shape[3]
            u_out[0, 0, q] = u_pl[q].reshape(rows, nb, r_in)
            v_out[0, 0, q] = v_pl[q].reshape(rows, nb, r_in)
        else:
            u_out[0, 0, q] = u_pl[q]
            v_out[0, 0, q] = v_pl[q]


def _pair_kernel_wino_hoisted(ut_ref, uh_ref, vt_ref, vh_ref, cet_ref,
                              ceh_ref, cot_ref, coh_ref, front_w,
                              front_b, kfg, cond_b, res_w, res_b, skip_w,
                              skip_b, fin_w, fin_b, zw, zb, an_s, an_b,
                              u_out, v_out, *, t_tile: int, n_t: int,
                              T: int, n_pair: int = 1, nb: int = 1):
    """Hoisted-conditioning Winograd variant: ce/co are precomputed cond
    pre-activation planes (even/odd flow), not raw c."""
    _pair_kernel_wino(ut_ref, uh_ref, vt_ref, vh_ref, cet_ref, ceh_ref,
                      cot_ref, coh_ref, front_w, front_b, kfg,
                      None, cond_b, res_w, res_b, skip_w, skip_b, fin_w,
                      fin_b, zw, zb, an_s, an_b, u_out, v_out,
                      t_tile=t_tile, n_t=n_t, T=T, n_pair=n_pair, nb=nb)


# operand order from pair_reverse_operands / _flow_operands:
#   0 front_w  1 front_b  2 kfg  3 cond_w  4 cond_b  5 res_w  6 res_b
#   7 skip_w   8 skip_b   9 fin_w 10 fin_b 11 zw    12 zb   13 an_s 14 an_b
_WEIGHT_OPERANDS = (0, 2, 3, 5, 7, 9, 11)


def pair_reverse_operands_wino(pair: dict, dtype=jnp.bfloat16):
    """Like pair_reverse_operands but with the fg conv kernels G-transformed
    for F(2,3): kfg becomes [2, n_layer, 4, Cin, Cout].  The transform runs
    in fp32 (the 0.5 factors are exact); weights are cast to ``dtype`` after,
    biases stay fp32."""
    ops = list(pair_reverse_operands(pair, dtype=jnp.float32))
    ops[2] = _wino_weights(ops[2])
    return tuple(o.astype(dtype) if i in _WEIGHT_OPERANDS else o
                 for i, o in enumerate(ops))


def pair_reverse_operands_wino4(pair: dict, dtype=jnp.bfloat16,
                                hoisted: bool = False):
    """F(4,3) operands: kfg becomes [2, n_layer, 6, Cin, Cout] (G-transform
    in fp32; the 1/6, 1/12, 1/24 factors round once into ``dtype``).

    ``hoisted=True`` additionally pops cond_w and returns
    (operands, (w_even, w_odd)) like pair_reverse_operands_hoisted."""
    ops = list(pair_reverse_operands(pair, dtype=jnp.float32))
    ops[2] = _wino4_weights(ops[2])
    ops = [o.astype(dtype) if i in _WEIGHT_OPERANDS else o
           for i, o in enumerate(ops)]
    if not hoisted:
        return tuple(ops)
    cond_w = ops.pop(_COND_W_IDX)
    n_layer = cond_w.shape[1]
    hoist = jnp.concatenate([cond_w[:, l] for l in range(n_layer)], axis=-1)
    return tuple(ops), (hoist[0], hoist[1])


def fused_chain_reverse_wino(u, v, c_a, c_b, operands, *, n_pair: int,
                             interpret=False, phases: int = 6,
                             hoisted: bool = False, nb: int = 1):
    """Winograd reverse chain of ``n_pair`` flow pairs in ONE kernel launch
    (one whole block when n_pair = n_flow/2).  ``operands`` from
    stack_chain_operands over pair_reverse_operands_wino[4] tuples.
    phases=6 -> F(2,3); phases=12 -> F(4,3).
    ``hoisted=True``: c_a/c_b are precomputed cond planes and operands
    exclude cond_w.
    ``nb``: batch-pack nb items per plane row (B % nb == 0) — every kernel
    matmul's M scales from rows to rows*nb with zero in-VMEM copies."""
    B, T, R_in = u.shape
    if B % nb != 0:
        raise ValueError(f"batch {B} not divisible by packing nb={nb}")
    dtype = u.dtype
    P = phases
    hr = 6 * n_pair  # halo plane rows per side (6 per chained pair)
    halo = hr * P
    t_tile, n_t, T_pad = _wino_geometry(T, P, n_pair)

    ut, uh = _tiles_and_halos_wino(u, t_tile, n_t, T_pad, P, halo, nb)
    vt, vh = _tiles_and_halos_wino(v, t_tile, n_t, T_pad, P, halo, nb)
    # conditioning may arrive pre-tiled per block (wino_cond_tiles)
    if isinstance(c_a, tuple):
        (cat, cah), (cbt, cbh) = c_a, c_b
        if (nb > 1) != (cat.ndim == 6):
            raise ValueError("pre-tiled cond packing does not match nb")
    else:
        cat, cah = _tiles_and_halos_wino(c_a, t_tile, n_t, T_pad, P, halo,
                                         nb)
        cbt, cbh = _tiles_and_halos_wino(c_b, t_tile, n_t, T_pad, P, halo,
                                         nb)
    Cc = cat.shape[-1]
    rows = t_tile // P
    Bc = B // nb

    kern = _pair_kernel_wino_hoisted if hoisted else _pair_kernel_wino
    kernel = functools.partial(kern, t_tile=t_tile, n_t=n_t, T=T,
                               n_pair=n_pair, nb=nb)
    grid = (Bc * n_t,)

    pack = (nb,) if nb > 1 else ()

    def in_map(g):
        return (g // n_t, g % n_t, 0, 0, 0) + ((0,) if nb > 1 else ())

    def tile_spec(C):
        return pl.BlockSpec((1, 1, P, rows) + pack + (C,), in_map,
                            memory_space=pltpu.VMEM)

    def halo_spec(C):
        return pl.BlockSpec((1, 1, P, 2 * hr) + pack + (C,), in_map,
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    mults = 4 / 6 if P == 6 else 6 / 12
    cond_flops = 0 if hoisted else 2 * Cc * 512
    flops_net = 2 * T * (mults * 2 * 3 * 256 * 512 + cond_flops
                         + 2 * 256 * 256 + 256 * 256 + 3 * R_in * 256
                         + 256 * 2 * R_in)
    u2, v2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(Cc), halo_spec(Cc),
            tile_spec(Cc), halo_spec(Cc),
        ] + [wspec] * len(operands),
        out_specs=[
            pl.BlockSpec((1, 1, P, rows) + pack + (R_in,), in_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, rows) + pack + (R_in,), in_map,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Bc, n_t, P, rows) + pack
                                        + (R_in,), dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * n_pair * flops_net),
            bytes_accessed=(ut.size + vt.size + cat.size + cbt.size
                            + 2 * B * T_pad * R_in) * dtype.itemsize,
            transcendentals=2 * B * T * n_pair * 512 * 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if _GRID_ARBITRARY
            else ("parallel",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ut, uh, vt, vh, cat, cah, cbt, cbh, *operands)

    def reinterleave(x):
        if nb > 1:
            # [Bc, n_t, P, rows, nb, R] -> [Bc, nb, n_t, rows, P, R]
            x = jnp.transpose(x, (0, 4, 1, 3, 2, 5))
        else:
            x = jnp.transpose(x, (0, 1, 3, 2, 4))   # [B, n_t, tt/P, P, R]
        return x.reshape(B, T_pad, R_in)[:, :T]

    return reinterleave(u2), reinterleave(v2)


def fused_pair_reverse_wino(u, v, c_a, c_b, operands, *, interpret=False,
                            phases: int = 6, hoisted: bool = False):
    """Winograd pair-flow reverse.  Same contract as fused_pair_reverse.
    Single-pair special case of fused_chain_reverse_wino."""
    return fused_chain_reverse_wino(u, v, c_a, c_b,
                                    stack_chain_operands([operands]),
                                    n_pair=1, interpret=interpret,
                                    phases=phases, hoisted=hoisted)


# ===========================================================================
# FORWARD pair kernel (training / NLL evaluation).
#
# The reverse kernels above cover synthesis only; SURVEY §2.4 names the
# fused gated ResBlock the hot op for BOTH passes (reference
# modules.py:110-128 runs identically in forward and reverse).  The forward
# pair step is the same two coupling-net evaluations with the affine update
# inverted and a logdet reduction added:
#
#     u <- (u + bE0) * sE0 ; v <- (v + bE1) * sE1     ActNorm.forward (even)
#     v <- (v - t(u; even)) * exp(-log_s(u; even))    AffineCoupling.forward
#     v <- (v + bO0) * sO0 ; u <- (u + bO1) * sO1     ActNorm.forward (odd)
#     u <- (u - t(v; odd)) * exp(-log_s(v; odd))      AffineCoupling.forward
#
# (s = exp(3*logs); the ActNorm logdets are parameter-only and summed
# OUTSIDE the kernel.)  The kernel also emits, per grid step, the raw
# sum of -log_s over the tile's OWN rows (halo rows excluded — adjacent
# tiles recompute them — and rows >= T masked), so the coupling logdet is
# sum / (B*T*R_in) / 2 outside (model.py:135 semantics).
#
# Training gradients: models/flowavenet.py wraps this in jax.custom_vjp
# whose backward re-derives the pair step with XLA ops (residuals = inputs
# only, i.e. the same memory profile as the scan's jax.checkpoint).
# ===========================================================================

def _pair_kernel_fw(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                    cbt_ref, cbh_ref, front_w, front_b, kfg, cond_w,
                    cond_b, res_w, res_b, skip_w, skip_b, fin_w, fin_b,
                    zw, zb, an_s, an_b, u_out, v_out, ld_out,
                    *, t_tile: int, n_t: int, T: int):
    """One FORWARD flow pair over a time tile.  Weight operands carry a
    leading [2] (flow even/odd) axis; an_s/an_b are the FORWARD ActNorm
    halves (s = exp(+3*logs), applied as (x + b) * s)."""
    g = pl.program_id(0)
    f32 = jnp.float32
    halo = HALO
    dtype = u_out.dtype
    u = _win_cat(ut_ref, uh_ref, halo)   # [L, R_in]; row j = pos j - halo
    v = _win_cat(vt_ref, vh_ref, halo)
    ca = _win_cat(cat_ref, cah_ref, halo)
    cb = _win_cat(cbt_ref, cbh_ref, halo)
    r_in = u.shape[-1]
    L = u.shape[0]
    tile_start = (g % n_t) * t_tile
    row0 = tile_start - halo             # global position of window row 0

    def flow_w(fi):
        return dict(front_w=front_w[fi], front_b=front_b[fi], kfg=kfg[fi],
                    cond_w=cond_w[fi], cond_b=cond_b[fi], res_w=res_w[fi],
                    res_b=res_b[fi], skip_w=skip_w[fi], skip_b=skip_b[fi],
                    fin_w=fin_w[fi], fin_b=fin_b[fi], zw=zw[fi], zb=zb[fi])

    # ActNorm forward (even): u half0, v half1
    u0 = (u.astype(f32) + an_b[0, 0].astype(f32)) * an_s[0, 0].astype(f32)
    v0 = (v.astype(f32) + an_b[0, 1].astype(f32)) * an_s[0, 1].astype(f32)
    # u0 feeds the coupling net's convs: zero it outside the sequence
    # (the XLA path gets this from zero-padded full-length tensors)
    u0 = _mask_valid(u0.astype(dtype), row0, T)

    # couple(even): v' = (v - t(u0)) * exp(-log_s(u0)) over rows [5, L-5)
    l_mid = L - 10
    net = _coupling_net(u0, ca, x_off=5, c_off=5, out_len=l_mid,
                        row0=row0 + 5, T=T, dtype=dtype, **flow_w(0))
    log_s, t = net[:, :r_in], net[:, r_in:]
    v_mid = ((jax.lax.slice_in_dim(v0, 5, 5 + l_mid, axis=0) - t)
             * jnp.exp(-log_s))

    # ActNorm forward (odd): v half0, u half1
    v1 = (v_mid + an_b[1, 0].astype(f32)) * an_s[1, 0].astype(f32)
    u1 = ((jax.lax.slice_in_dim(u0, 5, 5 + l_mid, axis=0).astype(f32)
           + an_b[1, 1].astype(f32)) * an_s[1, 1].astype(f32))
    # v1 feeds the second coupling net: mask outside the sequence
    v1m = _mask_valid(v1.astype(dtype), row0 + 5, T)

    # couple(odd): u' = (u - t(v1)) * exp(-log_s(v1)) over rows [10, L-10)
    l_out = L - 20
    net2 = _coupling_net(v1m, cb, x_off=5, c_off=10, out_len=l_out,
                         row0=row0 + 10, T=T, dtype=dtype, **flow_w(1))
    log_s2, t2 = net2[:, :r_in], net2[:, r_in:]
    u2 = ((jax.lax.slice_in_dim(u1, 5, 5 + l_out, axis=0) - t2)
          * jnp.exp(-log_s2))

    # outputs: u2 row i = pos row0+10+i, v1 row i = pos row0+5+i; crop both
    # to the tile's own rows [tile_start, tile_start + t_tile)
    u_out[0] = jax.lax.slice_in_dim(
        u2, halo - 10, halo - 10 + t_tile, axis=0).astype(dtype)
    v_out[0] = jax.lax.slice_in_dim(
        v1, halo - 5, halo - 5 + t_tile, axis=0).astype(dtype)

    # raw -log_s sum over the tile's own VALID rows (logdet numerator).
    # log_s row i = pos row0+5+i -> tile starts at index halo-5; log_s2
    # row i = pos row0+10+i -> index halo-10.
    ls_e = jax.lax.slice_in_dim(log_s, halo - 5, halo - 5 + t_tile, axis=0)
    ls_o = jax.lax.slice_in_dim(log_s2, halo - 10, halo - 10 + t_tile,
                                axis=0)
    pos = tile_start + jax.lax.broadcasted_iota(
        jnp.int32, (t_tile, 1), 0)
    valid = pos < T                       # tile rows are always >= 0
    s = jnp.sum(jnp.where(valid, -(ls_e + ls_o), 0.0))
    ld_out[0, 0] = jnp.full((128,), s, f32)


def pair_forward_operands(pair: dict, dtype=jnp.bfloat16):
    """Kernel operands for one FORWARD flow pair: identical folding to
    pair_reverse_operands except the ActNorm halves are in forward form
    (s = exp(+3*logs), applied (x + b) * s)."""
    even = jax.tree.map(lambda l: l[0], pair)
    odd = jax.tree.map(lambda l: l[1], pair)
    per_flow = [_flow_operands(even, dtype), _flow_operands(odd, dtype)]
    stacked = [jnp.stack([a, b]) for a, b in zip(*per_flow)]

    def an_halves(fp):
        logs3 = fp["actnorm"]["logs"].astype(jnp.float32)[0, 0] * 3.0
        b = fp["actnorm"]["b"].astype(jnp.float32)[0, 0]
        c2 = logs3.shape[0] // 2
        s = jnp.exp(logs3)
        return (jnp.stack([s[:c2], s[c2:]]), jnp.stack([b[:c2], b[c2:]]))

    an_e, an_o = an_halves(even), an_halves(odd)
    an_s = jnp.stack([an_e[0], an_o[0]])    # [flow, half, R_in]
    an_b = jnp.stack([an_e[1], an_o[1]])
    return tuple(stacked) + (an_s, an_b)


def fused_pair_forward(u, v, c_a, c_b, operands, *, t_tile: int = 1024,
                       interpret: bool = False):
    """Apply one FORWARD flow pair.  u, v: [B, T, R_in]; c_*: [B, T, Cc];
    ``operands`` from pair_forward_operands.  Returns (u', v', neg_logs_sum)
    where neg_logs_sum is the raw fp32 sum of -log_s over both couplings
    (caller normalizes to the reference's mean(-log_s)/2 logdet)."""
    B, T, R_in = u.shape
    dtype = u.dtype
    halo = HALO
    t_tile, n_t, T_pad = _fit_tile(T, t_tile, 16, halo)

    ut, uh = _tiles_and_halos(u, t_tile, n_t, T_pad, halo)
    vt, vh = _tiles_and_halos(v, t_tile, n_t, T_pad, halo)
    cat, cah = _tiles_and_halos(c_a, t_tile, n_t, T_pad, halo)
    cbt, cbh = _tiles_and_halos(c_b, t_tile, n_t, T_pad, halo)
    Cc = c_a.shape[-1]

    kernel = functools.partial(_pair_kernel_fw, t_tile=t_tile, n_t=n_t, T=T)
    grid = (B * n_t,)

    def in_map(g):
        return (g // n_t, g % n_t, 0, 0)

    def out_map(g):
        return (g // n_t, g % n_t, 0)

    def tile_spec(C):
        return pl.BlockSpec((1, 1, t_tile, C), in_map,
                            memory_space=pltpu.VMEM)

    def halo_spec(C):
        return pl.BlockSpec((1, 1, 2 * halo, C), in_map,
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_net = 2 * T * (2 * 3 * 256 * 512 + 2 * Cc * 512 + 2 * 256 * 256
                         + 256 * 256 + 3 * R_in * 256 + 256 * 2 * R_in)
    u2, v2, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(Cc), halo_spec(Cc),
            tile_spec(Cc), halo_spec(Cc),
        ] + [wspec] * len(operands),
        out_specs=[
            pl.BlockSpec((1, t_tile, R_in), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, R_in), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T_pad, R_in), dtype),
                   jax.ShapeDtypeStruct((B, T_pad, R_in), dtype),
                   jax.ShapeDtypeStruct((B * n_t, 1, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * flops_net,
            bytes_accessed=(ut.size + vt.size + cat.size + cbt.size
                            + 2 * B * T_pad * R_in) * dtype.itemsize,
            transcendentals=2 * B * T * 512 * 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if _GRID_ARBITRARY
            else ("parallel",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ut, uh, vt, vh, cat, cah, cbt, cbh, *operands)
    if T_pad != T:
        u2, v2 = u2[:, :T], v2[:, :T]
    return u2, v2, jnp.sum(ld[:, 0, 0])
