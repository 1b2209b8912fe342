"""FloWaveNet: mel-conditioned normalizing flow over raw audio, TPU-native.

Functional re-design of the reference model (/root/reference/model.py).  The
model is a pure ``init / apply`` pair over parameter pytrees:

* ``init``     -> params pytree (fp32)
* ``forward``  -> (log_p, logdet) for NLL training (model.py:317-347)
* ``reverse``  -> one-shot synthesis from noise (model.py:350-396)
* ``ddi``      -> data-dependent ActNorm init as an explicit functional pass
                  (replaces the in-graph tf.cond machinery, model.py:30-41)

TPU-first structure: the ``n_flow`` flows inside each block are homogeneous,
so their parameters are stacked on a leading axis and the block body is one
``jax.lax.scan`` — a single compiled step per block instead of 48 unrolled
flow graphs.  Blocks are heterogeneous (channels double per block,
model.py:295-299) and stay a Python loop of scanned stages.

Numerics match the reference exactly in fp32 (see tests/test_parity_tf.py):
ActNorm logdet = mean(3*logs) over channels (model.py:71,80); coupling
logdet = mean(-log_s)/2 (model.py:135); squeeze layout channel=2c+p
(model.py:224-228); log_p = mean(0.5*(-log 2pi - z^2)) (model.py:343).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..utils.flags import INT8 as _INT8_FLAG, env_flag as _env_flag
from ..utils.flags import env_float as _env_float, env_int as _env_int
from ..ops.squeeze import (change_order, squeeze, squeeze_level_cond_perm,
                           squeeze_to_level, unsqueeze)
from .modules import apply_wavenet, init_wavenet
from .upsample import apply_upsample, init_upsample

LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# ActNorm (model.py:7-105)
# ---------------------------------------------------------------------------

def init_actnorm(channels: int) -> dict:
    """Identity init; real values come from the DDI pass (model.py:55-70).

    (The reference leaves these at TF's default random init until the DDI
    step overwrites them — starting at identity is strictly saner and
    equivalent after DDI.)
    """
    return {"b": jnp.zeros((1, 1, channels), jnp.float32),
            "logs": jnp.zeros((1, 1, channels), jnp.float32)}


def actnorm_forward(p: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x -> (x + b) * exp(3*logs); logdet = mean(3*logs) (model.py:55-80)."""
    logs3 = p["logs"].astype(jnp.float32) * 3.0
    out = (x + p["b"].astype(x.dtype)) * jnp.exp(logs3).astype(x.dtype)
    return out, jnp.mean(logs3)


def actnorm_reverse(p: dict, x: jax.Array) -> jax.Array:
    logs3 = p["logs"].astype(jnp.float32) * 3.0
    return x * jnp.exp(-logs3).astype(x.dtype) - p["b"].astype(x.dtype)


def actnorm_ddi(x: jax.Array) -> dict:
    """Data-dependent init from one batch (model.py:55-56, 69-70):
    b = -mean(x), logs = log(1/(std+1e-7))/3 with stats over (batch, time)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1), keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=(0, 1), keepdims=True)
    logs = jnp.log(1.0 / (jnp.sqrt(var) + 1e-7)) / 3.0
    return {"b": -mean, "logs": logs}


# ---------------------------------------------------------------------------
# Affine coupling (model.py:108-164)
# ---------------------------------------------------------------------------

def _bound_log_s(log_s: jax.Array, clamp: float) -> jax.Array:
    """Soft bound log_s to (-clamp, clamp) via clamp*tanh(log_s/clamp)
    (ModelConfig.logs_clamp; 0.0 = identity = exact reference family).
    Smooth and odd, so the flow stays exactly invertible — forward and
    reverse both apply the SAME bounded value."""
    if clamp <= 0.0:
        return log_s
    c = jnp.asarray(clamp, log_s.dtype)
    return c * jnp.tanh(log_s / c)


# Threshold for the hinge regularizer's dead zone (TrainConfig.logs_hinge):
# |log_s| below this contributes NOTHING to the penalty.  5.0 sits well
# above the healthy training range (max|log_s| stayed under ~4 through the
# first 10k steps of every measured run) and well below where exp(±log_s)
# starts hurting numerics — the measured divergences passed ~8 only on
# their way to 30+ (docs/benchmarks.md, flagship divergence study).
LOGS_HINGE_MARGIN = _env_float("FWN_HINGE_MARGIN", 5.0)


def _log_s_stats(
        log_s: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(max |log_s|, sum log_s^2, sum relu(|log_s|-margin)^2) in fp32 —
    the divergence-diagnosis scalars (VERDICT r3: unbounded log_s growth
    preceded the flagship NaN, and nothing logged it) plus the hinge
    penalty's raw sum (TrainConfig.logs_hinge)."""
    ls = log_s.astype(jnp.float32)
    excess = jnp.maximum(jnp.abs(ls) - LOGS_HINGE_MARGIN, 0.0)
    return jnp.max(jnp.abs(ls)), jnp.sum(ls * ls), jnp.sum(excess * excess)


def coupling_forward(p: dict, x: jax.Array, c: jax.Array,
                     g: Optional[jax.Array], *, affine: bool, causal: bool,
                     use_pallas: bool = False, logs_clamp: float = 0.0,
                     stats: bool = False):
    in_a, in_b = jnp.split(x, 2, axis=2)
    c_a = jnp.split(c, 2, axis=2)[0]
    g_a = jnp.split(g, 2, axis=2)[0] if g is not None else None

    net_out = apply_wavenet(p, in_a, c_a, g_a, causal=causal,
                            use_pallas=use_pallas)
    if affine:
        log_s, t = jnp.split(net_out, 2, axis=2)
        log_s = _bound_log_s(log_s, logs_clamp)
        out_b = (in_b - t) * jnp.exp(-log_s)
        logdet = jnp.mean(-log_s.astype(jnp.float32)) / 2.0
    else:
        log_s = None
        out_b = in_b + net_out
        logdet = jnp.asarray(0.0, jnp.float32)
    out = jnp.concatenate([in_a, out_b], axis=2)
    if stats:
        zero = jnp.asarray(0.0, jnp.float32)
        return out, logdet, (_log_s_stats(log_s) if log_s is not None
                             else (zero, zero, zero))
    return out, logdet


def coupling_reverse(p: dict, x: jax.Array, c: jax.Array,
                     g: Optional[jax.Array], *, affine: bool,
                     causal: bool, use_pallas: bool = False,
                     logs_clamp: float = 0.0) -> jax.Array:
    out_a, out_b = jnp.split(x, 2, axis=2)
    c_a = jnp.split(c, 2, axis=2)[0]
    g_a = jnp.split(g, 2, axis=2)[0] if g is not None else None

    net_out = apply_wavenet(p, out_a, c_a, g_a, causal=causal,
                            use_pallas=use_pallas)
    if affine:
        log_s, t = jnp.split(net_out, 2, axis=2)
        log_s = _bound_log_s(log_s, logs_clamp)
        in_b = out_b * jnp.exp(log_s) + t
    else:
        in_b = out_b - net_out
    return jnp.concatenate([out_a, in_b], axis=2)


# ---------------------------------------------------------------------------
# Block: squeeze + n_flow scanned flow steps (model.py:207-280)
# ---------------------------------------------------------------------------

def init_block(key: jax.Array, in_channels: int, cin_channels: int,
               cfg: ModelConfig, gin_channels: int) -> dict:
    """Stacked params for one block.  Channel counts are those AFTER the
    block's squeeze (squeeze_dim = 2*in, model.py:212-218)."""
    sq, sq_c = 2 * in_channels, 2 * cin_channels
    sq_g = 2 * gin_channels if gin_channels > 0 else 0
    out_ch = sq if cfg.affine else sq // 2

    def one_flow(k):
        return {
            "actnorm": init_actnorm(sq),
            "coupling": init_wavenet(
                k, in_channels=sq // 2, out_channels=out_ch,
                num_layers=cfg.n_layer, residual_channels=cfg.filter_size,
                cin_channels=sq_c // 2,
                gin_channels=sq_g // 2 if sq_g else 0),
        }

    flows = [one_flow(k) for k in jax.random.split(key, cfg.n_flow)]
    return {"flows": jax.tree.map(lambda *xs: jnp.stack(xs), *flows)}


def _flow_step_fwd(cfg: ModelConfig, has_g: bool):
    def step(carry, fp):
        if has_g:
            x, c, g = carry
        else:
            (x, c), g = carry, None
        x, ld_a = actnorm_forward(fp["actnorm"], x)
        x, ld_c, st = coupling_forward(fp["coupling"], x, c, g,
                                       affine=cfg.affine, causal=cfg.causal,
                                       logs_clamp=cfg.logs_clamp, stats=True)
        x, c = change_order(x), change_order(c)
        if has_g:
            return (x, c, change_order(g)), (ld_a + ld_c, st)
        return (x, c), (ld_a + ld_c, st)
    return step


# ---------------------------------------------------------------------------
# Pair-scan fast path.
#
# change_order (model.py:166-174) only swaps channel halves between flows —
# it is a relabeling, not a computation.  Materializing it costs two full
# copies of x, c, g per flow; for synthesis at batch 64 that is ~0.5 GB of
# HBM traffic per flow on c alone.  Processing flows in PAIRS with the
# halves (u, v) as explicit scan state makes every change_order a pure
# re-routing of scan-carry slots, and the conditioning halves (c_a, c_b)
# become loop constants with zero per-flow traffic.  Numerics are identical
# to the generic path (tests/test_model.py::test_pair_scan_matches_generic).
# ---------------------------------------------------------------------------

def _an_half(fp_an: dict, half: int, x: jax.Array) -> jax.Array:
    """Apply one channel-half of an ActNorm (forward)."""
    C2 = x.shape[-1]
    sl = slice(0, C2) if half == 0 else slice(C2, 2 * C2)
    b = fp_an["b"][..., sl].astype(x.dtype)
    logs3 = (fp_an["logs"][..., sl].astype(jnp.float32) * 3.0)
    return (x + b) * jnp.exp(logs3).astype(x.dtype)


def _an_half_rev(fp_an: dict, half: int, x: jax.Array) -> jax.Array:
    C2 = x.shape[-1]
    sl = slice(0, C2) if half == 0 else slice(C2, 2 * C2)
    b = fp_an["b"][..., sl].astype(x.dtype)
    logs3 = (fp_an["logs"][..., sl].astype(jnp.float32) * 3.0)
    return x * jnp.exp(-logs3).astype(x.dtype) - b


def _couple_halves(fp: dict, u: jax.Array, v: jax.Array, c_half, g_half,
                   cfg: ModelConfig, reverse: bool, use_pallas: bool = False,
                   stats: bool = False):
    """Transform v given net(u).  Returns (v', logdet) — plus the
    (max|log_s|, sum log_s^2) diagnosis pair when ``stats``."""
    net_out = apply_wavenet(fp, u, c_half, g_half, causal=cfg.causal,
                            use_pallas=use_pallas)
    zero = jnp.asarray(0.0, jnp.float32)
    if cfg.affine:
        log_s, t = jnp.split(net_out, 2, axis=2)
        log_s = _bound_log_s(log_s, cfg.logs_clamp)
        if reverse:
            out, ld = v * jnp.exp(log_s) + t, zero
        else:
            out = (v - t) * jnp.exp(-log_s)
            ld = jnp.mean(-log_s.astype(jnp.float32)) / 2.0
        if stats:
            return out, ld, _log_s_stats(log_s)
        return out, ld
    out = (v - net_out) if reverse else (v + net_out)
    if stats:
        return out, zero, (zero, zero, zero)
    return out, zero


def _an_logdet(fp_an: dict) -> jax.Array:
    return jnp.mean(fp_an["logs"].astype(jnp.float32) * 3.0)


def _pair_params(p: dict):
    """Restack the flow axis [n_flow, ...] into pairs [n_flow//2, 2, ...]."""
    return jax.tree.map(
        lambda l: l.reshape((l.shape[0] // 2, 2) + l.shape[1:]), p["flows"])


def _pair_step_fwd(cfg: ModelConfig, c_a, c_b, g_a, g_b):
    def step(carry, pair):
        u, v = carry
        even = jax.tree.map(lambda l: l[0], pair)
        odd = jax.tree.map(lambda l: l[1], pair)
        # flow 2i: actnorm, couple v|u, change_order (label swap)
        u = _an_half(even["actnorm"], 0, u)
        v = _an_half(even["actnorm"], 1, v)
        v, ld0, st0 = _couple_halves(even["coupling"], u, v, c_a, g_a, cfg,
                                     reverse=False, stats=True)
        # labels now: first half = v, second = u
        v = _an_half(odd["actnorm"], 0, v)
        u = _an_half(odd["actnorm"], 1, u)
        u, ld1, st1 = _couple_halves(odd["coupling"], v, u, c_b, g_b, cfg,
                                     reverse=False, stats=True)
        # second change_order restores original labeling
        ld = (_an_logdet(even["actnorm"]) + _an_logdet(odd["actnorm"])
              + ld0 + ld1)
        st = (jnp.maximum(st0[0], st1[0]), st0[1] + st1[1],
              st0[2] + st1[2])
        return (u, v), (ld, st)
    return step


# (history) The per-resblock Pallas kernels (ops/pallas_resblock.py) beat
# XLA 1.8x standalone at block-0 shapes but LOSE in-model (1058 vs 976 ms
# reverse @ batch 64 x 4 s) and are no longer routed; the whole-pair kernel
# below supersedes them.  They remain available as standalone ops.

# NOTE (measured, round 2): hoisting the per-flow conditioning projections
# out of the scan into one stacked pre-scan matmul is numerics-neutral but
# SLOWER on v5e everywhere (block 5: 98 vs 85 ms; block 4: 128 vs 99 ms;
# full model 1411 vs 1390 ms @ batch 96) — the extra HBM round trip of the
# hoisted [n_flow, B, T, 2R] tensor costs more than the wider matmul saves.
# The deep blocks' inefficiency is fusion-boundary/op-count overhead, which
# the fused Pallas pair kernel (ops/pallas_flow.py) addresses instead.

# Conditioning width limit for the VMEM-resident-cond fused pair kernel.
# Measured on v5e (batch 96 x 4 s): standalone the kernel wins
# 584->444 ms on block 0, 331->297 on block 1, 204->186 on block 2;
# block 3 loses standalone (125->136) but WINS in-model (full reverse
# 1212.6 ms with block 3 routed vs 1230.6 without).  Cc = 80 * 2^b, so
# 640 admits blocks 0-3 in bf16; deeper blocks' cond weights exceed VMEM
# and use the HOISTED variant instead (cond matmuls precomputed outside
# as one big MXU-friendly dot per c half, the rest of the pair fused).
#
# int8 weights halve the resident footprint and admit deeper blocks;
# measured ladder with pre-quantized conditioning (b128 x 3.83 s, v5e):
# 640: 918.6 ms | 1280: 905.3 (winner — block 4's XLA scan ran at ~56%
# of its int8/bf16 mixed speed-of-light, the worst of the deep blocks) |
# 2560: 910.9 | 5120: 916.6 | 10240: 927.4 — blocks >=5 keep their
# near-peak XLA pair-scans.  FWN_MAX_CC overrides; otherwise the bound
# follows PAIR_KERNEL_INT8 at ROUTING time (_pair_max_cc below), not a
# value frozen at import — tools/int8_quality_gate.py toggles the flag
# at runtime and each mode must keep its own validated envelope.
PAIR_KERNEL_MAX_CC = _env_int("FWN_MAX_CC", 0) or None


def _pair_max_cc() -> int:
    """Conditioning-width bound for the reverse pair kernels, per the
    CURRENT int8 mode (1280 int8 / 640 bf16 unless FWN_MAX_CC is set)."""
    if PAIR_KERNEL_MAX_CC is not None:
        return PAIR_KERNEL_MAX_CC
    return 1280 if PAIR_KERNEL_INT8 else 640

# CPU has no Mosaic backend: the kernel only routes on accelerators, so
# use_pallas=True is safe as the config default.  Tests flip this to
# exercise the kernel in interpret mode in-model.
PAIR_KERNEL_CPU_INTERPRET = False

# Winograd pair kernels (ops/pallas_flow.py) for the narrow-cond blocks.
# F(2,3): 1.5x fewer MXU FLOPs on the dominant filter|gate convs;
# F(4,3) (12-phase planes): 2x fewer.  PAIR_KERNEL_WINO4 picks F(4,3)
# where Winograd routes at all.
PAIR_KERNEL_WINO = _env_flag("FWN_WINO", default=True)
# F(4,3) measured SLOWER than F(2,3) at production tiles (b96 x 4s:
# block 1 300 vs 265 ms) — per-phase matmul M halves, MXU pipeline
# fill/drain dominates.  Off pending larger-tile tuning.
PAIR_KERNEL_WINO4 = _env_flag("FWN_WINO4")
PAIR_KERNEL_WINO_MAX_CC = _env_int("FWN_WINO_MAX_CC", 320)

# EXPERIMENTAL int8 MXU for the direct kernel's filter|gate convs
# (FWN_INT8=1): 2x bf16 peak, adds ~0.8% weight quantization noise.
# Replaces the Winograd route for blocks 0-3 when on (int8 and the
# Winograd transform don't compose).  Opt-in only; see docs/benchmarks.md.
# Single source of truth: utils/flags.py (shared with ops/pallas_flow.py).
PAIR_KERNEL_INT8 = _INT8_FLAG

# Hoisted-conditioning pair kernel for the deep blocks.  Measured at
# t_tile 1024 (b96 x 4s) in bf16 it LOSES to in-model XLA (e2e 1205 vs
# 1108 ms; the round-1 stage profile overstated XLA's deep-block cost —
# in-model XLA runs blocks 4-7 in ~190 ms total at ~60% MXU).  Off by
# default; FWN_HOISTED=1 re-enables (with FWN_INT8 the fused pair's fg
# convs run on the int8 MXU, which may flip the verdict).
PAIR_KERNEL_HOISTED = _env_flag("FWN_HOISTED")
PAIR_KERNEL_HOISTED_T_TILE = 1024

# Batch packing for the Winograd kernels: nb consecutive batch items share
# each plane row, so every per-plane matmul's M grows from t_tile/P (160
# at the production tile) to nb*t_tile/P — attacking the measured small-M
# MXU underutilization (65-71% vs XLA's 83-93% on deep blocks) with ZERO
# in-VMEM copies (the pack rides the existing de-interleave transpose).
PAIR_KERNEL_PACK = _env_int("FWN_PACK", 1)


def _pack_factor(batch: int) -> int:
    """Largest usable packing factor <= FWN_PACK that divides the batch."""
    nb = max(1, min(PAIR_KERNEL_PACK, batch))
    while batch % nb:
        nb -= 1
    return nb


# FORWARD pair kernel for training / NLL eval (ops/pallas_flow.py
# _pair_kernel_fw): the same fused coupling-net evaluation as the reverse
# kernels, with the affine update inverted and the -log_s logdet reduction
# emitted per tile.  Gradients come from jax.custom_vjp: backward
# re-derives the pair step with XLA ops from input-only residuals — the
# same recompute strategy (and memory profile) as the scan path's
# jax.checkpoint, but the primal evaluation runs the fused kernel.
PAIR_KERNEL_FWD = _env_flag("FWN_FWD_KERNEL", default=False)
# The forward kernel is bf16-only (no int8 variant), so its width bound
# is the bf16 VMEM envelope — 640 admits blocks 0-3 — and must NOT track
# _pair_max_cc(), which FWN_INT8 (an inference-route knob, default on)
# raises to 1280: block 4's bf16 cond weights exceed VMEM, and which
# blocks TRAIN through the kernel must not depend on a synthesis flag.
PAIR_KERNEL_FWD_MAX_CC = _env_int("FWN_FWD_MAX_CC", 640)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_fwd_fused(interp: bool, pair, u, v, c_a, c_b):
    from ..ops import pallas_flow as pf
    ops = pf.pair_forward_operands(pair, u.dtype)
    return pf.fused_pair_forward(u, v, c_a, c_b, ops, interpret=interp)


def _pair_fwd_ref(pair, u, v, c_a, c_b):
    """XLA mirror of the fused forward pair (affine, non-causal, no g):
    returns (u', v', raw -log_s sum) exactly like fused_pair_forward."""
    even = jax.tree.map(lambda l: l[0], pair)
    odd = jax.tree.map(lambda l: l[1], pair)
    u1 = _an_half(even["actnorm"], 0, u)
    v1 = _an_half(even["actnorm"], 1, v)
    net = apply_wavenet(even["coupling"], u1, c_a, None, causal=False)
    log_s, t = jnp.split(net, 2, axis=2)
    v2 = (v1 - t) * jnp.exp(-log_s)
    s0 = jnp.sum(-log_s.astype(jnp.float32))
    v3 = _an_half(odd["actnorm"], 0, v2)
    u2 = _an_half(odd["actnorm"], 1, u1)
    net2 = apply_wavenet(odd["coupling"], v3, c_b, None, causal=False)
    log_s2, t2 = jnp.split(net2, 2, axis=2)
    u3 = (u2 - t2) * jnp.exp(-log_s2)
    s1 = jnp.sum(-log_s2.astype(jnp.float32))
    return u3, v3, s0 + s1


def _pair_fwd_fused_f(interp, pair, u, v, c_a, c_b):
    return _pair_fwd_fused(interp, pair, u, v, c_a, c_b), (pair, u, v,
                                                           c_a, c_b)


def _pair_fwd_fused_b(interp, res, ct):
    # Tie the XLA recompute to the ARRIVING cotangents: the recompute
    # depends only on residuals (available right after the forward pass),
    # so without this barrier XLA hoists every pair's recomputed
    # activations ahead of the backward chain and OOMs at b128 (measured:
    # 19.6G vs the 15.75G chip).  The barrier restores the scan+remat
    # schedule: one pair's recompute lives at a time.
    res, ct = jax.lax.optimization_barrier((res, ct))
    _, vjp = jax.vjp(_pair_fwd_ref, *res)
    return vjp(ct)


_pair_fwd_fused.defvjp(_pair_fwd_fused_f, _pair_fwd_fused_b)


# FULLY-FUSED training pair kernel (ops/pallas_flow_train.py): forward
# pair kernel with exact log_s stats AND a hand-derived Pallas backward
# that recomputes the pair in VMEM and accumulates every weight grad in
# fp32 — the round-5 answer to round 4's arithmetic-only rejection of a
# fused fwd+bwd kernel.  The VJP boundary sits at the folded operands,
# so weight-norm/ActNorm folding is differentiated by XLA autodiff.
# Default OFF until the chip measurement promotes it (tools/
# bench_train_kernel.py); stats are exact so the divergence guards
# (logs_hinge/logs_l2) work unchanged under this route.
TRAIN_KERNEL = _env_flag("FWN_TRAIN_KERNEL", default=False)
# Width bound: fp32 weight-grad accumulators + bf16 weights must fit the
# kernel's VMEM budget; Cc=640 (block 3) totals ~20 MB of the 64 MB cap.
# Default 80 routes ONLY block 0 — the chip measurement
# (tools/bench_train_pair.py, docs/benchmarks.md round 5) shows the
# kernel wins 1.13x at block 0's R_in=1 geometry, ties block 1, and
# loses blocks 2-3, so wider routing would slow the step.
TRAIN_KERNEL_MAX_CC = _env_int("FWN_TRAIN_MAX_CC", 80)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_train_fused(interp, ops, u, v, c_a, c_b):
    from ..ops import pallas_flow_train as pft
    return pft.fused_pair_train_fwd(u, v, c_a, c_b, ops,
                                    interpret=interp)


def _pair_train_fused_f(interp, ops, u, v, c_a, c_b):
    return (_pair_train_fused(interp, ops, u, v, c_a, c_b),
            (ops, u, v, c_a, c_b))


def _pair_train_fused_b(interp, res, ct):
    ops, u, v, c_a, c_b = res
    # ct = (du', dv', d raw, d max, d sumsq, d hinge).  max|log_s| is a
    # diagnostic (never part of the optimized loss); its cotangent is
    # dropped — differentiating through the max is unsupported here.
    gu, gv, gr, _gmx, gq, gh = ct
    from ..ops import pallas_flow_train as pft
    d_ops, du, dv, dca, dcb = pft.fused_pair_train_bwd(
        u, v, c_a, c_b, gu, gv, gr, gq, gh, ops, interpret=interp)
    return d_ops, du, dv, dca, dcb


_pair_train_fused.defvjp(_pair_train_fused_f, _pair_train_fused_b)


# Block-fused chain: run ALL n_flow/2 pairs of a block in ONE kernel
# launch (ops/pallas_flow.py fused_chain_reverse*).  Reads u/v/c once per
# block instead of once per pair and deletes the inter-pair de/re-
# interleave glue.  MEASURED (b128 x 3.83 s, v5e): 1327.7 ms vs 1180.7
# per-pair — the c re-reads it saves are cheap (compute-bound kernels)
# while the chained halo regions add ~7% MXU work and the 3x-longer grid
# steps pipeline worse.  Default OFF for throughput; the knob remains for
# dispatch-bound small-batch latency experiments.
PAIR_KERNEL_CHAIN = _env_flag("FWN_CHAIN", default=False)


def _permute_cond_rows(flows: dict, perm) -> dict:
    """Permute the conditioning convs' INPUT rows (weight-norm ``v``; the
    L2 norm is a sum over those rows, so the fold is unchanged).

    Used with ops/squeeze.py squeeze_level_cond_perm: the caller feeds the
    couplings the FREE reshape view of the upsampled mel instead of the
    squeeze_to_level copy, and this permutation makes the 1x1 cond matmuls
    numerically equivalent (same products, reordered sum)."""
    coup = flows["coupling"]
    layers = []
    for layer in coup["layers"]:
        layer = dict(layer)
        for kk in ("filter_c", "gate_c"):
            layer[kk] = {**layer[kk], "v": layer[kk]["v"][..., perm, :]}
        layers.append(layer)
    return {**flows, "coupling": {**coup, "layers": layers}}


def _pair_kernel_eligible(cfg: ModelConfig, has_g: bool) -> bool:
    """Base eligibility for the fused pair-flow reverse kernels
    (ops/pallas_flow.py): affine, non-causal, n_layer == 2, no global
    conditioning.  Which VARIANT runs is decided by _pair_kernel_mode."""
    if jax.default_backend() == "cpu" and not PAIR_KERNEL_CPU_INTERPRET:
        return False
    # logs_clamp rewrites the affine update (exp(B*tanh(log_s/B))) — the
    # kernels bake the unbounded exp(log_s); fall back to the XLA scans.
    return (cfg.use_pallas and not has_g and cfg.affine and not cfg.causal
            and cfg.n_layer == 2 and cfg.logs_clamp == 0.0)


def _pair_kernel_mode(cfg: ModelConfig, cc_half: int,
                      has_g: bool) -> Optional[str]:
    """'wino' | 'direct' | 'hoisted' | None, by conditioning width."""
    if not _pair_kernel_eligible(cfg, has_g):
        return None
    if PAIR_KERNEL_INT8 and cc_half <= _pair_max_cc():
        return "int8"
    if PAIR_KERNEL_WINO and cc_half <= PAIR_KERNEL_WINO_MAX_CC:
        return "wino4" if PAIR_KERNEL_WINO4 else "wino"
    if cc_half <= _pair_max_cc():
        return "direct"
    if PAIR_KERNEL_HOISTED:
        return "hoisted"
    return None


def _pair_step_rev(cfg: ModelConfig, c_a, c_b, g_a, g_b,
                   use_pallas: bool = False):
    def step(carry, pair):
        u, v = carry
        even = jax.tree.map(lambda l: l[0], pair)
        odd = jax.tree.map(lambda l: l[1], pair)
        # inverse of _pair_step_fwd, flows in reverse order
        u, _ = _couple_halves(odd["coupling"], v, u, c_b, g_b, cfg,
                              reverse=True, use_pallas=use_pallas)
        v = _an_half_rev(odd["actnorm"], 0, v)
        u = _an_half_rev(odd["actnorm"], 1, u)
        v, _ = _couple_halves(even["coupling"], u, v, c_a, g_a, cfg,
                              reverse=True, use_pallas=use_pallas)
        u = _an_half_rev(even["actnorm"], 0, u)
        v = _an_half_rev(even["actnorm"], 1, v)
        return (u, v), None
    return step


def block_forward(p: dict, cfg: ModelConfig, x, c, g, *,
                  return_stats: bool = False, remat: bool | None = None):
    """Forward through one block.  Returns (x, c, g, logdet); with
    ``return_stats`` a fifth element (max|log_s|, sum log_s^2,
    sum relu(|log_s|-margin)^2) is appended (fp32 scalars over every
    coupling in the block).
    ``remat`` overrides cfg.remat for THIS block (forward() uses it to
    implement cfg.remat_blocks' selective policy)."""
    do_remat = cfg.remat if remat is None else remat
    x, c = squeeze(x), squeeze(c)
    g = squeeze(g) if g is not None else None
    has_g = g is not None
    zero = jnp.asarray(0.0, jnp.float32)

    def out(x, c, g, ld, st):
        if return_stats:
            return x, c, g, ld, st
        return x, c, g, ld

    if cfg.n_flow % 2 == 0:
        u, v = jnp.split(x, 2, axis=2)
        c_a, c_b = jnp.split(c, 2, axis=2)
        g_a, g_b = jnp.split(g, 2, axis=2) if has_g else (None, None)
        if (TRAIN_KERNEL and _pair_kernel_eligible(cfg, has_g)
                and c_a.shape[-1] <= TRAIN_KERNEL_MAX_CC):
            # fully-fused fwd+bwd pair kernel (custom_vjp with a Pallas
            # backward; input-only residuals ARE the remat policy, so no
            # jax.checkpoint).  log_s stats come out of the kernel
            # exactly, so the divergence guards stay live on this route.
            from ..ops import pallas_flow as pf
            interp = jax.default_backend() == "cpu"
            pp = _pair_params(p)
            B, T_lvl, r_in = u.shape
            ld = jnp.asarray(0.0, jnp.float32)
            raw = jnp.asarray(0.0, jnp.float32)
            mx = jnp.asarray(0.0, jnp.float32)
            sq = jnp.asarray(0.0, jnp.float32)
            hq = jnp.asarray(0.0, jnp.float32)
            for i in range(cfg.n_flow // 2):
                pair = jax.tree.map(lambda l, _i=i: l[_i], pp)
                ops = pf.pair_forward_operands(pair, u.dtype)
                u, v, s, m_, q_, h_ = _pair_train_fused(interp, ops, u, v,
                                                        c_a, c_b)
                raw, mx = raw + s, jnp.maximum(mx, m_)
                sq, hq = sq + q_, hq + h_
                ld = (ld + _an_logdet(jax.tree.map(lambda l: l[0],
                                                   pair)["actnorm"])
                      + _an_logdet(jax.tree.map(lambda l: l[1],
                                                pair)["actnorm"]))
            ld = ld + raw / (B * T_lvl * r_in) / 2.0
            return out(jnp.concatenate([u, v], axis=2), c, g, ld,
                       (mx, sq, hq))
        if (PAIR_KERNEL_FWD and _pair_kernel_eligible(cfg, has_g)
                and c_a.shape[-1] <= PAIR_KERNEL_FWD_MAX_CC):
            # fused forward pair kernel (custom_vjp; no jax.checkpoint —
            # the vjp's input-only residuals already ARE the remat policy).
            # log_s never materializes whole here, so the divergence stats
            # read 0 under FWN_FWD_KERNEL=1 (a measured-rejected knob).
            interp = jax.default_backend() == "cpu"
            pp = _pair_params(p)
            B, T_lvl, r_in = u.shape
            ld = jnp.asarray(0.0, jnp.float32)
            raw = jnp.asarray(0.0, jnp.float32)
            for i in range(cfg.n_flow // 2):
                pair = jax.tree.map(lambda l, _i=i: l[_i], pp)
                u, v, s = _pair_fwd_fused(interp, pair, u, v, c_a, c_b)
                raw = raw + s
                ld = (ld + _an_logdet(jax.tree.map(lambda l: l[0],
                                                   pair)["actnorm"])
                      + _an_logdet(jax.tree.map(lambda l: l[1],
                                                pair)["actnorm"]))
            # mean(-log_s)/2 per coupling (model.py:135): raw sums are over
            # [B, T_lvl, r_in] half-tensors
            ld = ld + raw / (B * T_lvl * r_in) / 2.0
            return out(jnp.concatenate([u, v], axis=2), c, g, ld,
                       (zero, zero, zero))
        step = _pair_step_fwd(cfg, c_a, c_b, g_a, g_b)
        if do_remat:
            step = jax.checkpoint(step, prevent_cse=False)
        (u, v), (lds, sts) = jax.lax.scan(step, (u, v), _pair_params(p))
        return out(jnp.concatenate([u, v], axis=2), c, g, jnp.sum(lds),
                   (jnp.max(sts[0]), jnp.sum(sts[1]), jnp.sum(sts[2])))

    step = _flow_step_fwd(cfg, has_g)
    if do_remat:
        step = jax.checkpoint(step, prevent_cse=False)
    carry = (x, c, g) if has_g else (x, c)
    carry, (lds, sts) = jax.lax.scan(step, carry, p["flows"])
    if has_g:
        x, c, g = carry
    else:
        x, c = carry
    return out(x, c, g, jnp.sum(lds),
               (jnp.max(sts[0]), jnp.sum(sts[1]), jnp.sum(sts[2])))


def _flow_step_rev(cfg: ModelConfig, has_g: bool, use_pallas: bool = False):
    def step(carry, fp):
        if has_g:
            x, c, g = carry
            g = change_order(g)
        else:
            (x, c), g = carry, None
        x, c = change_order(x), change_order(c)
        x = coupling_reverse(fp["coupling"], x, c, g,
                             affine=cfg.affine, causal=cfg.causal,
                             use_pallas=use_pallas,
                             logs_clamp=cfg.logs_clamp)
        x = actnorm_reverse(fp["actnorm"], x)
        if has_g:
            return (x, c, g), None
        return (x, c), None
    return step


def block_reverse(p: dict, cfg: ModelConfig, x, c=None, g=None, *,
                  unsqueeze_cond: bool = True, c_halves=None,
                  g_halves=None, cond_perm=None, c_scales=None):
    """Inverse of block_forward on already-squeezed tensors; unsqueezes at
    the end (model.py:249-277).

    ``unsqueeze_cond=False`` skips unsqueezing c/g (returned as None):
    ``reverse`` extracts each block's conditioning directly from the
    upsampled mel with ``squeeze_to_level`` instead of threading c through
    the blocks, halving the full-tensor transpose copies.

    ``c_halves=(c_a, c_b)`` supplies the coupling halves pre-split (the
    half split commutes with squeezing: half A at EVERY level is exactly
    the lower num_mels/2 mel bins, so ``reverse`` splits the upsampled mel
    once instead of copying per level); mutually exclusive with ``c``.

    ``cond_perm``: the c halves are FREE reshape views (not
    squeeze_to_level copies) and the cond weight rows must be permuted by
    this index array to compensate (see squeeze_level_cond_perm).

    ``c_scales=(s_a, s_b)``: the c halves are PRE-quantized int8 views
    with these PER-ROW ([B, 1, 1]) activation scales (one quantization
    pass in ``reverse`` shared by every block) — handed to the int8
    kernels as a per-row SMEM operand; the deep-block scan path receives
    them inside the (q, scale) tuples its int8 cond matmuls expect.
    Per-row (not per-tensor) scales keep each batch row's audio
    independent of its companions (serving's batch-composition
    invariance; ops/conv.py quantize_act)."""
    if cond_perm is not None:
        assert c_halves is not None, "cond_perm implies pre-split c_halves"
        p = {**p, "flows": _permute_cond_rows(p["flows"], cond_perm)}
    if c_halves is not None:
        assert c is None and not unsqueeze_cond, \
            "c_halves replaces c and implies unsqueeze_cond=False"
        has_g = g_halves is not None
    else:
        has_g = g is not None

    if cfg.n_flow % 2 == 0:
        u, v = jnp.split(x, 2, axis=2)
        if c_halves is not None:
            c_a, c_b = c_halves
            g_a, g_b = g_halves if has_g else (None, None)
        else:
            c_a, c_b = jnp.split(c, 2, axis=2)
            g_a, g_b = jnp.split(g, 2, axis=2) if has_g else (None, None)
        # c halves may arrive pre-tiled for the wino kernels
        # ((tiles, halos) tuples from ops.pallas_flow.wino_cond_tiles)
        cc_half = (c_a[0].shape[-1] if isinstance(c_a, tuple)
                   else c_a.shape[-1])
        mode = _pair_kernel_mode(cfg, cc_half, has_g)
        if mode is not None:
            from ..ops import pallas_flow as pf
            interp = jax.default_backend() == "cpu"
            pp = _pair_params(p)
            n_pair = cfg.n_flow // 2
            if mode == "hoisted":
                # Deep blocks: cond weights exceed VMEM.  Precompute every
                # pair's conditioning pre-activations with ONE big matmul
                # per c half (K = Cc/2 up to 10240 — MXU-friendly), then
                # run the fused kernel on the streamed planes.
                make_hoisted = (pf.pair_reverse_operands_hoisted_int8
                                if PAIR_KERNEL_INT8
                                else pf.pair_reverse_operands_hoisted)
                ops, we, wo = [], [], []
                for i in range(n_pair):
                    pair = jax.tree.map(lambda l, _i=i: l[_i], pp)
                    o, (w_e, w_o) = make_hoisted(pair, dtype=x.dtype)
                    ops.append(o)
                    we.append(w_e)
                    wo.append(w_o)
                pw = we[0].shape[-1]  # n_layer * 2R per pair
                ce = jnp.dot(c_a, jnp.concatenate(we, -1),
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
                co = jnp.dot(c_b, jnp.concatenate(wo, -1),
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
                for i in reversed(range(n_pair)):
                    u, v = pf.fused_pair_reverse(
                        u, v, ce[..., i * pw:(i + 1) * pw],
                        co[..., i * pw:(i + 1) * pw], ops[i],
                        t_tile=PAIR_KERNEL_HOISTED_T_TILE,
                        interpret=interp, hoisted=True,
                        int8=PAIR_KERNEL_INT8)
            else:
                # Winograd (F(4,3) 12-phase / F(2,3) 6-phase) for the
                # narrow-cond blocks; direct-conv kernel otherwise
                # (docs/benchmarks.md).
                nb = _pack_factor(u.shape[0])
                if mode == "wino4":
                    make_ops = pf.pair_reverse_operands_wino4
                    run = functools.partial(pf.fused_chain_reverse_wino,
                                            phases=12, nb=nb)
                elif mode == "wino":
                    make_ops = pf.pair_reverse_operands_wino
                    run = functools.partial(pf.fused_chain_reverse_wino,
                                            nb=nb)
                elif mode == "int8":
                    make_ops = pf.pair_reverse_operands_int8
                    crs = None
                    if c_scales is not None:
                        # per-row scales ride a [B, 2] SMEM operand (each
                        # grid step is one batch row), NOT a weight fold —
                        # a fold would smear one row's scale over all
                        crs = jnp.concatenate(
                            [jnp.reshape(s.astype(jnp.float32), (-1, 1))
                             for s in c_scales], axis=1)
                    run = functools.partial(pf.fused_chain_reverse,
                                            int8=True, c_row_scales=crs)
                else:
                    make_ops = pf.pair_reverse_operands
                    run = pf.fused_chain_reverse
                if PAIR_KERNEL_CHAIN:
                    # whole block in ONE launch: all pairs' folded weights
                    # ride VMEM together; u/v/c are read once
                    ops = pf.stack_chain_operands([
                        make_ops(jax.tree.map(lambda l, _i=i: l[_i], pp),
                                 dtype=x.dtype)
                        for i in range(n_pair)])
                    u, v = run(u, v, c_a, c_b, ops, n_pair=n_pair,
                               interpret=interp)
                else:
                    for i in reversed(range(n_pair)):
                        pair = jax.tree.map(lambda l, _i=i: l[_i], pp)
                        u, v = run(u, v, c_a, c_b,
                                   pf.stack_chain_operands(
                                       [make_ops(pair, dtype=x.dtype)]),
                                   n_pair=1, interpret=interp)
        else:
            # tuples here are either (q, scale) pre-quantized halves (OK,
            # consumed by the scan's int8 cond matmuls) or wino plane
            # tiles (wrong route)
            assert not (isinstance(c_a, tuple) and c_a[0].ndim > 3), \
                "pre-tiled cond requires a wino kernel route"
            if PAIR_KERNEL_INT8 and _pair_kernel_eligible(cfg, has_g):
                # Deep blocks (cond too wide for VMEM-resident kernels):
                # the conditioning 1x1s are ~all of the block's FLOPs
                # (K = Cc/2 up to 10240 with constant per-block cost —
                # docs/benchmarks.md), so run THEM on the int8 MXU inside
                # the XLA pair-scan.  Activations quantize once per block
                # (scan constants) unless they arrive pre-quantized from
                # ``reverse``; weights per-out-channel per flow.
                if not isinstance(c_a, tuple):
                    from ..ops.conv import quantize_act
                    c_a = quantize_act(c_a, per_row=True)
                    c_b = quantize_act(c_b, per_row=True)
            # (measured: unroll=True is time-neutral here but adds ~45 s
            # of compile — the scan stays)
            (u, v), _ = jax.lax.scan(
                _pair_step_rev(cfg, c_a, c_b, g_a, g_b), (u, v),
                _pair_params(p), reverse=True)
        x = jnp.concatenate([u, v], axis=2)
    else:
        if c_halves is not None:  # generic path wants the full tensor
            c = jnp.concatenate(c_halves, axis=2)
            g = jnp.concatenate(g_halves, axis=2) if has_g else None
        carry = (x, c, g) if has_g else (x, c)
        carry, _ = jax.lax.scan(_flow_step_rev(cfg, has_g), carry,
                                p["flows"], reverse=True)
        if has_g:
            x, c, g = carry
        else:
            x, c = carry
    x = unsqueeze(x)
    if not unsqueeze_cond:
        return x, None, None
    c = unsqueeze(c)
    g = unsqueeze(g) if has_g else None
    return x, c, g


def _flow_step_ddi(cfg: ModelConfig, has_g: bool):
    def step(carry, fp):
        if has_g:
            x, c, g = carry
        else:
            (x, c), g = carry, None
        an = actnorm_ddi(x)
        x, _ = actnorm_forward(an, x)
        x, _ = coupling_forward(fp["coupling"], x, c, g,
                                affine=cfg.affine, causal=cfg.causal,
                                logs_clamp=cfg.logs_clamp)
        x, c = change_order(x), change_order(c)
        if has_g:
            return (x, c, change_order(g)), an
        return (x, c), an
    return step


def block_ddi(p: dict, cfg: ModelConfig, x, c, g):
    x, c = squeeze(x), squeeze(c)
    g = squeeze(g) if g is not None else None
    has_g = g is not None
    carry = (x, c, g) if has_g else (x, c)
    carry, new_an = jax.lax.scan(_flow_step_ddi(cfg, has_g), carry,
                                 p["flows"])
    if has_g:
        x, c, g = carry
    else:
        x, c = carry
    # new_an leaves have shape [n_flow, 1, 1, C] — same as stored.
    new_p = {"flows": {**p["flows"], "actnorm": new_an}}
    return x, c, g, new_p


# ---------------------------------------------------------------------------
# Full model (model.py:282-404)
# ---------------------------------------------------------------------------

class FloWaveNet(NamedTuple):
    """Thin namespace bundling the functional API with a config."""
    cfg: ModelConfig

    def init(self, key: jax.Array) -> dict:
        return init_flowavenet(key, self.cfg)

    def forward(self, params, x, c, g=None, compute_dtype=jnp.float32):
        return forward(params, self.cfg, x, c, g, compute_dtype)

    def reverse(self, params, z, c, g=None, compute_dtype=jnp.float32):
        return reverse(params, self.cfg, z, c, g, compute_dtype)

    def ddi(self, params, x, c, g=None, compute_dtype=jnp.float32):
        return ddi(params, self.cfg, x, c, g, compute_dtype)


def init_flowavenet(key: jax.Array, cfg: ModelConfig) -> dict:
    keys = jax.random.split(key, cfg.n_block + 2)
    params: dict = {"upsample": init_upsample(keys[0], cfg.upsample_scales)}
    if cfg.gin_channels > 0:
        limit = math.sqrt(6.0 / (cfg.n_speakers + cfg.gin_channels))
        params["speaker_emb"] = jax.random.uniform(
            keys[1], (cfg.n_speakers, cfg.gin_channels), jnp.float32,
            -limit, limit)
    blocks = []
    in_ch, cin_ch = 1, cfg.num_mels
    gin = cfg.gin_channels if cfg.gin_channels > 0 else 0
    for i in range(cfg.n_block):
        blocks.append(init_block(keys[2 + i], in_ch, cin_ch, cfg, gin))
        in_ch, cin_ch, gin = in_ch * 2, cin_ch * 2, gin * 2
    params["blocks"] = blocks
    return params


def _check_shapes(cfg: ModelConfig, x: jax.Array, c: jax.Array) -> None:
    sq = cfg.squeeze_factor
    hop = cfg.hop_size
    if x.ndim != 3 or x.shape[-1] != 1:
        raise ValueError(f"audio must be [B, T, 1], got {x.shape}")
    if c.ndim != 3 or c.shape[-1] != cfg.num_mels:
        raise ValueError(
            f"mel must be [B, T_mel, {cfg.num_mels}], got {c.shape}")
    if x.shape[1] % sq != 0:
        raise ValueError(
            f"T={x.shape[1]} must be divisible by 2**n_block={sq} "
            f"(each of the {cfg.n_block} blocks halves time)")
    if c.shape[1] * hop != x.shape[1]:
        raise ValueError(
            f"audio/mel misaligned: T={x.shape[1]} != T_mel*hop="
            f"{c.shape[1]}*{hop}={c.shape[1] * hop}")


def _prepare_cond(params: dict, cfg: ModelConfig, c: jax.Array,
                  g: Optional[jax.Array], compute_dtype):
    """Mel upsampling + speaker-embedding lookup (model.py:328-336)."""
    c = apply_upsample(params["upsample"], c.astype(compute_dtype),
                       cfg.upsample_scales)
    if cfg.gin_channels > 0:
        if g is None:
            raise ValueError("gin_channels > 0 requires speaker ids g "
                             "(model.py:320-321)")
        emb = params["speaker_emb"][g].astype(compute_dtype)  # [B, gin]
        g_emb = jnp.broadcast_to(emb[:, None, :],
                                 (emb.shape[0], c.shape[1], emb.shape[1]))
        if cfg.parity_drop_global_cond:
            # Reference bug (modules.py:189): g never reaches the nets.
            g_emb = None
    else:
        g_emb = None
    return c, g_emb


def forward(params: dict, cfg: ModelConfig, x: jax.Array, c: jax.Array,
            g: Optional[jax.Array] = None, compute_dtype=jnp.float32,
            return_stats: bool = False):
    """NLL forward pass.  x: [B, T, 1] audio; c: [B, T/hop, num_mels] mel;
    g: [B] int speaker ids.  Returns fp32 (log_p, logdet) in nats/dim
    (model.py:342-347).

    ``return_stats`` appends a dict of divergence-diagnosis scalars:
    per-block logdets, max|log_s| over every coupling, and mean(log_s^2)
    (the quantity TrainConfig.logs_l2 penalizes)."""
    _check_shapes(cfg, x, c)
    x = x.astype(compute_dtype)
    c, g_emb = _prepare_cond(params, cfg, c, g, compute_dtype)

    logdet = jnp.asarray(0.0, jnp.float32)
    out = x
    nel = x.size  # B*T*1; squeezes preserve it, so == every level's size
    block_lds = []
    max_ls = jnp.asarray(0.0, jnp.float32)
    sumsq_ls = jnp.asarray(0.0, jnp.float32)
    hinge_ls = jnp.asarray(0.0, jnp.float32)
    n_ls = 0
    rb = cfg.remat_blocks
    for bi, bp in enumerate(params["blocks"]):
        bl_remat = cfg.remat and (rb < 0 or bi < rb)
        if return_stats:
            out, c, g_emb, ld, st = block_forward(bp, cfg, out, c, g_emb,
                                                  return_stats=True,
                                                  remat=bl_remat)
            max_ls = jnp.maximum(max_ls, st[0])
            sumsq_ls = sumsq_ls + st[1]
            hinge_ls = hinge_ls + st[2]
            # each coupling's log_s is a half-tensor of the block's
            # squeezed x: B * T_lvl * C_lvl/2 == x.size/2 elements, per flow
            n_ls += cfg.n_flow * out.shape[0] * out.shape[1] \
                * out.shape[2] // 2
            block_lds.append(ld)
        else:
            out, c, g_emb, ld = block_forward(bp, cfg, out, c, g_emb,
                                              remat=bl_remat)
        logdet = logdet + ld
    z32 = out.astype(jnp.float32)
    log_p = jnp.mean(0.5 * (-LOG_2PI - z32 * z32))
    if return_stats:
        stats = {f"logdet_block{i}": ld for i, ld in enumerate(block_lds)}
        stats["max_log_s"] = max_ls
        stats["logs_mean_sq"] = sumsq_ls / max(n_ls, 1)
        # Normalized EXACTLY like the logdet (sum over couplings of the
        # per-coupling mean / 2 == raw sum / x.size), so the hinge weight
        # trades one-for-one against the logdet's pull on log_s: per
        # element, d(-logdet)/d log_s = 1/nel while d(hinge)/d log_s =
        # 2*weight*excess/nel — weight w stalls runaway growth at
        # |log_s| = margin + 1/(2w).
        stats["logs_hinge"] = hinge_ls / max(nel, 1)
        return log_p, logdet, stats
    return log_p, logdet


def reverse(params: dict, cfg: ModelConfig, z: jax.Array, c: jax.Array,
            g: Optional[jax.Array] = None, compute_dtype=jnp.float32
            ) -> jax.Array:
    """One-shot synthesis: z [B, T, 1] noise -> audio [B, T, 1]
    (model.py:350-396).  x is squeezed to the deepest level up front; each
    block's conditioning is extracted DIRECTLY from the upsampled mel at
    that block's level (one gather) instead of the reference's
    squeeze-down-8x-then-unsqueeze-up-8x chain — identical values
    (ops/squeeze.py:squeeze_to_level), ~16 fewer full-tensor transposes."""
    _check_shapes(cfg, z, c)
    z = z.astype(compute_dtype)
    c, g_emb = _prepare_cond(params, cfg, c, g, compute_dtype)

    # The coupling half split commutes with squeezing ONLY when the
    # pre-squeeze channel count is even (then half A at every level == the
    # lower num_mels/2 mel bins): split once here, extract per block.
    gin = g_emb.shape[-1] if g_emb is not None else 0
    fast_split = cfg.num_mels % 2 == 0 and gin % 2 == 0

    x = squeeze_to_level(z, cfg.n_block)
    if fast_split:
        c_lo, c_hi = jnp.split(c, 2, axis=2)
        g_lo, g_hi = (jnp.split(g_emb, 2, axis=2) if g_emb is not None
                      else (None, None))
        # int8 routes: quantize the mel halves ONCE, with PER-ROW scales.
        # Every block's c half is a reshape VIEW of the same data, so the
        # per-block/per-tile max-abs scales this replaces were (deep
        # blocks) or were approximately (kernel tiles) the same value;
        # the kernels then read half the c bytes and skip their
        # in-kernel amax/round pass.  Per-row (not per-tensor) scales
        # keep each batch row's codes independent of its companions —
        # serving's batch-composition invariance.  Quality-gated on
        # trained weights next to the other int8 scopes
        # (tools/int8_quality_gate.py).
        q8 = None
        if (PAIR_KERNEL_INT8 and g_emb is None and cfg.n_flow % 2 == 0
                and _pair_kernel_eligible(cfg, False)):
            from ..ops.conv import quantize_act
            q8 = (quantize_act(c_lo, per_row=True),
                  quantize_act(c_hi, per_row=True))
        for bi in reversed(range(cfg.n_block)):
            k = bi + 1
            cc_half = (cfg.num_mels << k) // 2
            mode = (_pair_kernel_mode(cfg, cc_half, g_emb is not None)
                    if cfg.n_flow % 2 == 0 else None)
            cond_perm = None
            c_scales = None
            if mode in ("wino", "wino4"):
                # build the kernels' plane tiles DIRECTLY from the mel
                # halves: one transpose fuses the level extraction and
                # the plane de-interleave, once per block (pair-constant)
                from ..ops import pallas_flow as pf
                P = 12 if mode == "wino4" else 6
                n_pair_k = cfg.n_flow // 2 if PAIR_KERNEL_CHAIN else 1
                nb = _pack_factor(z.shape[0])
                c_halves = (pf.wino_cond_tiles(c_lo, k, P, n_pair_k, nb),
                            pf.wino_cond_tiles(c_hi, k, P, n_pair_k, nb))
            elif g_emb is None and (
                    mode in ("int8", "direct")
                    or (mode is None and PAIR_KERNEL_INT8
                        and cfg.n_flow % 2 == 0
                        and _pair_kernel_eligible(cfg, False))):
                # direct-kernel and int8 deep-block routes: feed the FREE
                # reshape view of the mel halves and permute the cond
                # weight rows instead — same sums, zero per-block
                # full-tensor squeeze_to_level copies (~4 ms/block at
                # b128 x 3.83 s each way)
                Bc, Tc, C0 = c_lo.shape
                lvl = lambda h: h.reshape(Bc, Tc >> k, C0 << k)
                cond_perm = squeeze_level_cond_perm(k, C0)
                if q8 is not None and mode == "int8":
                    # pre-quantized tiles; scales fold into cond weights
                    c_halves = (lvl(q8[0][0]), lvl(q8[1][0]))
                    c_scales = (q8[0][1], q8[1][1])
                elif q8 is not None and mode is None:
                    # deep-block scan: (q, scale) tuples for its int8
                    # cond matmuls
                    c_halves = ((lvl(q8[0][0]), q8[0][1]),
                                (lvl(q8[1][0]), q8[1][1]))
                else:
                    c_halves = (lvl(c_lo), lvl(c_hi))
            else:
                c_halves = (squeeze_to_level(c_lo, k),
                            squeeze_to_level(c_hi, k))
            g_halves = ((squeeze_to_level(g_lo, k),
                         squeeze_to_level(g_hi, k))
                        if g_emb is not None else None)
            x, _, _ = block_reverse(params["blocks"][bi], cfg, x,
                                    unsqueeze_cond=False,
                                    c_halves=c_halves, g_halves=g_halves,
                                    cond_perm=cond_perm,
                                    c_scales=c_scales)
        return x

    for bi in reversed(range(cfg.n_block)):
        k = bi + 1
        c_k = squeeze_to_level(c, k)
        g_k = squeeze_to_level(g_emb, k) if g_emb is not None else None
        x, _, _ = block_reverse(params["blocks"][bi], cfg, x, c_k, g_k,
                                unsqueeze_cond=False)
    return x


def ddi(params: dict, cfg: ModelConfig, x: jax.Array, c: jax.Array,
        g: Optional[jax.Array] = None, compute_dtype=jnp.float32) -> dict:
    """Data-dependent ActNorm initialization over one batch.

    Functional equivalent of the reference's first-step init
    (train.py:179,221-230 + model.py:30-41): each ActNorm's (b, logs) is set
    from the statistics of its own input, computed sequentially through the
    flow (couplings are exact identities at fresh init thanks to the
    zero-init last conv, so this matches the reference's in-step assign).
    Returns a full params pytree with updated ActNorms.
    """
    _check_shapes(cfg, x, c)
    x = x.astype(compute_dtype)
    c, g_emb = _prepare_cond(params, cfg, c, g, compute_dtype)

    new_blocks = []
    out = x
    for bp in params["blocks"]:
        out, c, g_emb, new_bp = block_ddi(bp, cfg, out, c, g_emb)
        new_blocks.append(new_bp)
    return {**params, "blocks": new_blocks}


def loss_fn(params: dict, cfg: ModelConfig, x, c, g=None,
            compute_dtype=jnp.float32, logs_l2: float = 0.0,
            logs_hinge: float = 0.0) -> tuple[jax.Array, dict]:
    """NLL = -(log_p + logdet) in nats/dim (train.py:60); aux metrics include
    bits/dim for the published baseline metric, plus divergence-diagnosis
    scalars (per-block logdet, max|log_s|, mean log_s^2 — VERDICT r3: the
    flagship NaN's precursor was unlogged log_s growth).

    ``logs_l2`` > 0 adds logs_l2 * mean(log_s^2) to the OPTIMIZED loss
    (TrainConfig.logs_l2).  ``logs_hinge`` > 0 adds a hinge-squared
    penalty on |log_s| past LOGS_HINGE_MARGIN — EXACTLY ZERO in the
    healthy regime, logdet-normalized so weight w stalls the measured
    runaway mode at |log_s| = margin + 1/(2w) (the L2 alone failed a 50k
    flagship run: it pressures the MEAN while the MAX runs away —
    docs/benchmarks.md, divergence study).  aux["loss"] stays the pure
    NLL for reference-comparable curves, aux["logs_penalty"] reports the
    combined term."""
    log_p, logdet, stats = forward(params, cfg, x, c, g, compute_dtype,
                                   return_stats=True)
    loss = -(log_p + logdet)
    aux = {"loss": loss, "log_p": log_p, "logdet": logdet,
           "bits_per_dim": loss / math.log(2.0), **stats}
    total = loss
    if logs_l2 > 0.0 or logs_hinge > 0.0:
        if PAIR_KERNEL_FWD and _pair_kernel_eligible(cfg, g is not None):
            # the fused forward pair kernel never materializes log_s, so
            # its blocks contribute HARD ZERO to logs_mean_sq/logs_hinge
            # — the penalty would silently not apply while metrics report
            # a healthy 0 right up to the NaN it exists to prevent.
            raise ValueError(
                "FWN_FWD_KERNEL=1 is incompatible with the log_s "
                "divergence guards (logs_hinge/logs_l2): the fused pair "
                "kernel's log_s stats read 0, disabling the penalty "
                "silently.  Unset FWN_FWD_KERNEL for guarded training, "
                "or set logs_hinge=0 and logs_l2=0 to train unguarded.")
        penalty = jnp.asarray(0.0, jnp.float32)
        if logs_l2 > 0.0:
            penalty = penalty + logs_l2 * stats["logs_mean_sq"]
        if logs_hinge > 0.0:
            penalty = penalty + logs_hinge * stats["logs_hinge"]
        aux["logs_penalty"] = penalty
        total = loss + penalty
    return total, aux
