"""Fused forward+BACKWARD Pallas pair kernels for TRAINING.

Round-4 review left exactly one perf decision in this repo unbacked by a
measurement: the fused forward+backward pair kernel was "rejected on
arithmetic" — a VMEM sizing argument assuming a ~16 MB budget.  That
arithmetic used the wrong budget: v5e has 128 MB of VMEM/core and the
reverse kernels in ops/pallas_flow.py already run with a 64 MB scoped
limit.  At early-block geometry (conditioning width Cc <= 640) the fp32
weight-gradient accumulators total ~9-14 MB, so a SINGLE backward kernel
per flow pair fits: it recomputes the pair forward from input-only
residuals (the same remat policy as the XLA scan path), runs the whole
activation-gradient chain in VMEM, and accumulates every weight gradient
in fp32 across grid steps — no staged relaunches, no activation exports
to HBM.

Reference surface: the gradient path of /root/reference/train.py:35-60
(tower loss -> tf.gradients) through model.py Flow/AffineCoupling and
modules.py Wavenet, re-derived by hand for the fused TPU kernel.

Units (matching ops/pallas_flow.py's pair kernels — affine, non-causal,
n_layer == 2, kernel 3, dilations 1 and 3, no global conditioning):

    forward (primal, _pair_kernel_fws):  the extended forward pair kernel
        — identical math to _pair_kernel_fw plus per-tile log_s stats
        (max|log_s|, sum log_s^2, sum relu(|log_s|-margin)^2) so the
        divergence guards (TrainConfig.logs_hinge/logs_l2) stay exact
        when training routes through the kernel.

    backward (_pair_kernel_bwd): given cotangents (du', dv') and the
        scalar cotangents of (raw -log_s sum, sum log_s^2, hinge sum),
        produce du, dv, dc_a, dc_b and the gradients of every folded
        weight operand.  The VJP boundary sits at pair_forward_operands'
        OUTPUT, so the tiny param-space folding (weight-norm, exp(3s)
        zero-conv scale, ActNorm halves) is differentiated by XLA
        autodiff outside the kernel.

Region plan (window coords; halo H = 32 rows each side, window
L = t_tile + 64; the pair's forward receptive field is +-10 and the
backward's is +-20, + conv margins):

    tile rows            Tr   = [H, L-H)
    N1 recompute out     O1   = [H-15, L-(H-15))   (v3 needed over O2+-5)
    N2 recompute out     O2   = [H-10, L-(H-10))   (dnet2 over tile+-10)
    dnet1                O1B  = [H-5,  L-(H-5))    (du complete over Tr)

Gradient completeness: d x over a coupling's dnet region [a, b) is
complete over [a+5, b-5); every weight-grad row sum is restricted to the
tile's own rows (each global row accumulated by exactly one grid step)
and to valid positions < T.  The scalar cotangent terms on log_s
(logdet, L2, hinge) apply at every VALID row — including halo rows,
whose d log_s values must be globally correct for the cross-tile chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.flags import env_float as _env_float
from ..utils.flags import env_int as _env_int
from .pallas_flow import (ACC_DTYPE, GATE_DTYPE, SQRT_HALF,
                          VMEM_LIMIT_BYTES, _coupling_net, _fit_tile,
                          _mask_valid, _tiles_and_halos, _win_cat,
                          pair_forward_operands)

# Backward halo: the chain du <- dnet1 <- dv3 <- dnet2 <- gu spans +-10
# of cotangent and the recompute under it another +-10 of input (+ conv
# margins <= 6); 32 keeps every slice sublane-aligned in bf16.
BHALO = 32
# Same dead-zone margin as models/flowavenet.py LOGS_HINGE_MARGIN (env
# knob shared; redefined here to avoid a models<->ops import cycle).
HINGE_MARGIN = _env_float("FWN_HINGE_MARGIN", 5.0)
# Time-tile overrides for the training kernels (sweepable on chip).
TRAIN_FWD_TT = _env_int("FWN_TRAIN_FWD_TT", 1024, multiple_of=16)
TRAIN_BWD_TT = _env_int("FWN_TRAIN_BWD_TT", 512, multiple_of=16)


def _rows(buf, o: int, lo: int, hi: int):
    """Rows [lo, hi) in WINDOW coordinates from a buffer whose row 0
    sits at window row ``o``."""
    return jax.lax.slice_in_dim(buf, lo - o, hi - o, axis=0)


def _conv3f(buf, o: int, w, *, lo: int, hi: int, d: int):
    """Forward 3-tap conv over out rows [lo, hi):
    out[t] = sum_k buf[t + (k-1)*d] @ w[k]."""
    cin = buf.shape[-1]
    acc = None
    for k in range(3):
        tap = _rows(buf, o, lo + (k - 1) * d, hi + (k - 1) * d)
        if cin >= 8:
            t_ = jnp.dot(tap, w[k], preferred_element_type=ACC_DTYPE)
        else:
            t_ = None
            for c in range(cin):
                p = (tap[:, c:c + 1].astype(ACC_DTYPE)
                     * w[k][c].astype(ACC_DTYPE)[None, :])
                t_ = p if t_ is None else t_ + p
        acc = t_ if acc is None else acc + t_
    return acc


def _conv3t(g, o: int, w, *, lo: int, hi: int, d: int):
    """Transposed 3-tap conv (input-gradient) over rows [lo, hi):
    dx[t] = sum_k g[t - (k-1)*d] @ w[k]^T."""
    cout = w.shape[-2]
    acc = None
    for k in range(3):
        tap = _rows(g, o, lo - (k - 1) * d, hi - (k - 1) * d)
        if cout >= 8:
            t_ = jax.lax.dot_general(tap, w[k], (((1,), (1,)), ((), ())),
                                     preferred_element_type=ACC_DTYPE)
        else:
            # Mosaic can't lower a dot_general whose minor output dim is
            # sub-lane (dx is [n, R_in], R_in as small as 1): multiply by
            # the weight row and reduce over the lane axis instead
            # (mirrors _conv3f's small-cin branch).
            cols = [jnp.sum(tap.astype(ACC_DTYPE)
                            * w[k][j].astype(ACC_DTYPE)[None, :],
                            axis=1, keepdims=True) for j in range(cout)]
            t_ = cols[0] if cout == 1 else jnp.concatenate(cols, axis=1)
        acc = t_ if acc is None else acc + t_
    return acc


def _rowsum(x):
    return jnp.sum(x.astype(jnp.float32), axis=0)


def _dot_rows(a, b):
    """a^T @ b contracting the row axis: [n, Ca] x [n, Cb] -> [Ca, Cb]."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Extended FORWARD pair kernel: _pair_kernel_fw + log_s stats
# ---------------------------------------------------------------------------

def _pair_kernel_fws(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                     cbt_ref, cbh_ref, front_w, front_b, kfg, cond_w,
                     cond_b, res_w, res_b, skip_w, skip_b, fin_w, fin_b,
                     zw, zb, an_s, an_b, u_out, v_out, st_out,
                     *, t_tile: int, n_t: int, T: int, halo: int):
    """Forward flow pair over a time tile (ops/pallas_flow.py
    _pair_kernel_fw) with a 4-scalar stats output per tile:
    st_out rows = [raw -log_s sum, max|log_s|, sum log_s^2,
    sum relu(|log_s|-margin)^2] over the tile's VALID rows."""
    g = pl.program_id(0)
    f32 = jnp.float32
    dtype = u_out.dtype
    u = _win_cat(ut_ref, uh_ref, halo)
    v = _win_cat(vt_ref, vh_ref, halo)
    ca = _win_cat(cat_ref, cah_ref, halo)
    cb = _win_cat(cbt_ref, cbh_ref, halo)
    r_in = u.shape[-1]
    L = u.shape[0]
    tile_start = (g % n_t) * t_tile
    row0 = tile_start - halo

    def flow_w(fi):
        return dict(front_w=front_w[fi], front_b=front_b[fi], kfg=kfg[fi],
                    cond_w=cond_w[fi], cond_b=cond_b[fi], res_w=res_w[fi],
                    res_b=res_b[fi], skip_w=skip_w[fi], skip_b=skip_b[fi],
                    fin_w=fin_w[fi], fin_b=fin_b[fi], zw=zw[fi], zb=zb[fi])

    u0 = (u.astype(f32) + an_b[0, 0].astype(f32)) * an_s[0, 0].astype(f32)
    v0 = (v.astype(f32) + an_b[0, 1].astype(f32)) * an_s[0, 1].astype(f32)
    u0 = _mask_valid(u0.astype(dtype), row0, T)

    l_mid = L - 10
    net = _coupling_net(u0, ca, x_off=5, c_off=5, out_len=l_mid,
                        row0=row0 + 5, T=T, dtype=dtype, **flow_w(0))
    log_s, t = net[:, :r_in], net[:, r_in:]
    v_mid = ((jax.lax.slice_in_dim(v0, 5, 5 + l_mid, axis=0) - t)
             * jnp.exp(-log_s))

    v1 = (v_mid + an_b[1, 0].astype(f32)) * an_s[1, 0].astype(f32)
    u1 = ((jax.lax.slice_in_dim(u0, 5, 5 + l_mid, axis=0).astype(f32)
           + an_b[1, 1].astype(f32)) * an_s[1, 1].astype(f32))
    v1m = _mask_valid(v1.astype(dtype), row0 + 5, T)

    l_out = L - 20
    net2 = _coupling_net(v1m, cb, x_off=5, c_off=10, out_len=l_out,
                         row0=row0 + 10, T=T, dtype=dtype, **flow_w(1))
    log_s2, t2 = net2[:, :r_in], net2[:, r_in:]
    u2 = ((jax.lax.slice_in_dim(u1, 5, 5 + l_out, axis=0) - t2)
          * jnp.exp(-log_s2))

    u_out[0] = jax.lax.slice_in_dim(
        u2, halo - 10, halo - 10 + t_tile, axis=0).astype(dtype)
    v_out[0] = jax.lax.slice_in_dim(
        v1, halo - 5, halo - 5 + t_tile, axis=0).astype(dtype)

    ls_e = jax.lax.slice_in_dim(log_s, halo - 5, halo - 5 + t_tile, axis=0)
    ls_o = jax.lax.slice_in_dim(log_s2, halo - 10, halo - 10 + t_tile,
                                axis=0)
    pos = tile_start + jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
    valid = pos < T
    zerof = jnp.zeros_like(ls_e)
    ls_ev = jnp.where(valid, ls_e, zerof)
    ls_ov = jnp.where(valid, ls_o, zerof)
    raw = jnp.sum(-(ls_ev + ls_ov))
    mx = jnp.maximum(jnp.max(jnp.abs(ls_ev)), jnp.max(jnp.abs(ls_ov)))
    sq = jnp.sum(ls_ev * ls_ev) + jnp.sum(ls_ov * ls_ov)
    m = jnp.asarray(HINGE_MARGIN, f32)
    he = jnp.maximum(jnp.abs(ls_ev) - m, 0.0) * valid
    ho = jnp.maximum(jnp.abs(ls_ov) - m, 0.0) * valid
    hq = jnp.sum(he * he) + jnp.sum(ho * ho)
    st_out[0, 0] = jnp.full((128,), raw, f32)
    st_out[0, 1] = jnp.full((128,), mx, f32)
    st_out[0, 2] = jnp.full((128,), sq, f32)
    st_out[0, 3] = jnp.full((128,), hq, f32)


def fused_pair_train_fwd(u, v, c_a, c_b, operands, *, t_tile: int = 0,
                         interpret: bool = False):
    """Primal of the training pair step.  Returns
    (u', v', raw_neg_logs_sum, max|log_s|, sum log_s^2, hinge_sum) —
    the three stat scalars over VALID rows, fp32."""
    B, T, R_in = u.shape
    dtype = u.dtype
    halo = 16  # forward RF is +-10, as in _pair_kernel_fw
    t_tile, n_t, T_pad = _fit_tile(T, t_tile or TRAIN_FWD_TT, 16, halo)

    ut, uh = _tiles_and_halos(u, t_tile, n_t, T_pad, halo)
    vt, vh = _tiles_and_halos(v, t_tile, n_t, T_pad, halo)
    cat, cah = _tiles_and_halos(c_a, t_tile, n_t, T_pad, halo)
    cbt, cbh = _tiles_and_halos(c_b, t_tile, n_t, T_pad, halo)
    Cc = c_a.shape[-1]

    kernel = functools.partial(_pair_kernel_fws, t_tile=t_tile, n_t=n_t,
                               T=T, halo=halo)
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
    u2, v2, st = pl.pallas_call(
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
            pl.BlockSpec((1, 4, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, T_pad, R_in), dtype),
                   jax.ShapeDtypeStruct((B, T_pad, R_in), dtype),
                   jax.ShapeDtypeStruct((B * n_t, 4, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * flops_net,
            bytes_accessed=(ut.size + vt.size + cat.size + cbt.size
                            + 2 * B * T_pad * R_in) * dtype.itemsize,
            transcendentals=2 * B * T * 512 * 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ut, uh, vt, vh, cat, cah, cbt, cbh, *operands)
    if T_pad != T:
        u2, v2 = u2[:, :T], v2[:, :T]
    return (u2, v2, jnp.sum(st[:, 0, 0]), jnp.max(st[:, 1, 0]),
            jnp.sum(st[:, 2, 0]), jnp.sum(st[:, 3, 0]))


# ---------------------------------------------------------------------------
# BACKWARD pair kernel
# ---------------------------------------------------------------------------

def _net_fwd_res(x, xo: int, c, co: int, W: dict, *, lo: int, hi: int,
                 row0, T: int, dtype):
    """Coupling-net forward over net rows [lo, hi) (window coords),
    keeping the residuals the backward chain needs.  ``x`` is the net
    input buffer (row 0 at window row xo); ``c`` the conditioning buffer
    (row 0 at window row co).  Mirrors ops/pallas_flow.py _coupling_net
    (fp32 accumulation, GATE_DTYPE gates, edge masking)."""
    acc = ACC_DTYPE
    f32 = jnp.float32
    # h0 = relu(front(x)) over [lo-4, hi+4)
    h0 = _conv3f(x, xo, W["front_w"], lo=lo - 4, hi=hi + 4, d=1)
    h0 = jnp.maximum(h0 + W["front_b"].astype(acc), 0.0).astype(dtype)
    h0 = _mask_valid(h0, row0 + lo - 4, T)

    # layer 0 (d=1) over [lo-3, hi+3)
    fg0 = _conv3f(h0, lo - 4, W["kfg"][0], lo=lo - 3, hi=hi + 3, d=1)
    fg0 += jnp.dot(_rows(c, co, lo - 3, hi + 3), W["cond_w"][0],
                   preferred_element_type=acc)
    fg0 += W["cond_b"][0].astype(acc)
    r = fg0.shape[-1] // 2
    # gates in fp32 always (FWN_GATE_BF16 is a forward-probe knob; the
    # backward needs jnp.tanh, which Mosaic can't lower in bf16)
    fgg = fg0.astype(f32)
    t0 = jnp.tanh(fgg[:, :r]).astype(dtype)
    s0 = jax.nn.sigmoid(fgg[:, r:]).astype(dtype)
    g0 = (t0.astype(f32) * s0.astype(f32)).astype(dtype)
    rs_w = jnp.concatenate([W["res_w"], W["skip_w"][0]], axis=-1)
    rs = jnp.dot(g0, rs_w, preferred_element_type=acc)
    res0 = rs[:, :r] + W["res_b"].astype(acc)
    h1 = ((_rows(h0, lo - 4, lo - 3, hi + 3).astype(acc) + res0)
          * SQRT_HALF).astype(dtype)
    h1 = _mask_valid(h1, row0 + lo - 3, T)

    # layer 1 (d=3) over [lo, hi)
    fg1 = _conv3f(h1, lo - 3, W["kfg"][1], lo=lo, hi=hi, d=3)
    fg1 += jnp.dot(_rows(c, co, lo, hi), W["cond_w"][1],
                   preferred_element_type=acc)
    fg1 += W["cond_b"][1].astype(acc)
    fgg1 = fg1.astype(f32)
    t1 = jnp.tanh(fgg1[:, :r]).astype(dtype)
    s1 = jax.nn.sigmoid(fgg1[:, r:]).astype(dtype)
    g1 = (t1.astype(f32) * s1.astype(f32)).astype(dtype)

    sk = (_rows(rs[:, r:], lo - 3, lo, hi) + W["skip_b"][0].astype(acc)
          + jnp.dot(g1, W["skip_w"][1], preferred_element_type=acc)
          + W["skip_b"][1].astype(acc))
    o1 = jnp.maximum(sk, 0.0).astype(dtype)
    o2 = jnp.dot(o1, W["fin_w"], preferred_element_type=acc)
    o2 = jnp.maximum(o2 + W["fin_b"].astype(acc), 0.0).astype(dtype)
    net = jnp.dot(o2, W["zw"], preferred_element_type=f32)
    net = net + W["zb"].astype(f32)
    # residual offsets: h0 @ lo-4; t0/s0/g0/rs/h1 @ lo-3; t1/s1/g1/o1/o2
    # @ lo
    return net, dict(h0=h0, t0=t0, s0=s0, g0=g0, h1=h1, t1=t1, s1=s1,
                     g1=g1, o1=o1, o2=o2)


def _net_bwd(dnet, a: int, b: int, x, xo: int, c, co: int, W: dict,
             res: dict, lo: int, *, sel, validf, dtype):
    """Backward of _net_fwd_res given dnet over net rows [a, b)
    (a >= lo + ... margins hold by construction).  ``sel(v, off)`` zeroes
    rows outside the tile's accumulation window (and invalid positions).

    Returns (dx over [a+5, b-5), dc over [a+3, b-3) aligned rows,
    weight-grad dict, dc region bounds)."""
    f32 = jnp.float32
    one = jnp.asarray(1.0, f32)
    dW = {}
    dnet_s = sel(dnet, a)
    o2 = _rows(res["o2"], lo, a, b)
    dW["zw"] = _dot_rows(o2.astype(dtype), dnet_s.astype(dtype))
    dW["zb"] = _rowsum(dnet_s)
    do2 = jax.lax.dot_general(dnet.astype(dtype), W["zw"],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    # relu masks: compare in f32 — Mosaic v5e rejects bf16 compares
    dpre2 = do2 * (o2.astype(f32) > 0).astype(f32)
    o1 = _rows(res["o1"], lo, a, b)
    dW["fin_w"] = _dot_rows(o1.astype(dtype), sel(dpre2, a).astype(dtype))
    dW["fin_b"] = _rowsum(sel(dpre2, a))
    do1 = jax.lax.dot_general(dpre2.astype(dtype), W["fin_w"],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dsk = do1 * (o1.astype(f32) > 0).astype(f32)
    dsk_s = sel(dsk, a)

    # layer 1 (d=3)
    g1 = _rows(res["g1"], lo, a, b)
    dW["skip_w1"] = _dot_rows(g1.astype(dtype), dsk_s.astype(dtype))
    dW["skip_b1"] = _rowsum(dsk_s)
    dW["skip_b0"] = dW["skip_b1"]
    dg1 = jax.lax.dot_general(dsk.astype(dtype), W["skip_w"][1],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    t1 = _rows(res["t1"], lo, a, b).astype(f32)
    s1 = _rows(res["s1"], lo, a, b).astype(f32)
    dfg1 = jnp.concatenate([dg1 * s1 * (one - t1 * t1),
                            dg1 * t1 * s1 * (one - s1)], axis=-1)
    dfg1_s = sel(dfg1, a)
    dfg1_sd = dfg1_s.astype(dtype)
    for k in range(3):
        h1tap = _rows(res["h1"], lo - 3, a + (k - 1) * 3, b + (k - 1) * 3)
        dW[f"kfg1_{k}"] = _dot_rows(h1tap, dfg1_sd)
    dW["cond_w1"] = _dot_rows(_rows(c, co, a, b), dfg1_sd)
    dW["cond_b1"] = _rowsum(dfg1_s)
    dc = jax.lax.dot_general(dfg1.astype(dtype), W["cond_w"][1],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    # dc from layer 1 covers [a, b); crop to the common region [a+3, b-3)
    dc = _rows(dc, a, a + 3, b - 3)

    # dh1 over [a+3, b-3); the forward masked h1 outside [0, T), so
    # gradients into those rows are exactly zero
    dh1 = validf(_conv3t(dfg1.astype(dtype), a, W["kfg"][1], lo=a + 3,
                         hi=b - 3, d=3), a + 3)
    # d rs over [a+3, b-3): res half sqrt(.5)*dh1, skip half row-aligned.
    # Kept as TWO matmuls (not a channel concat): Mosaic can't concatenate
    # vectors whose sublane offsets differ (dh1 is conv-aligned, the dsk
    # rows carry a +3 slice offset), and the split is FLOP-identical.
    dh1h = dh1 * SQRT_HALF
    dsk3 = _rows(dsk, a, a + 3, b - 3)
    dW["res_b"] = _rowsum(sel(dh1h, a + 3))
    g0 = _rows(res["g0"], lo - 3, a + 3, b - 3)
    dW["res_w"] = _dot_rows(g0.astype(dtype), sel(dh1h, a + 3).astype(dtype))
    dW["skip_w0"] = _dot_rows(g0.astype(dtype), sel(dsk3, a + 3).astype(dtype))
    dg0 = (jax.lax.dot_general(dh1h.astype(dtype), W["res_w"],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dsk3.astype(dtype), W["skip_w"][0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))
    t0 = _rows(res["t0"], lo - 3, a + 3, b - 3).astype(f32)
    s0 = _rows(res["s0"], lo - 3, a + 3, b - 3).astype(f32)
    dfg0 = jnp.concatenate([dg0 * s0 * (one - t0 * t0),
                            dg0 * t0 * s0 * (one - s0)], axis=-1)
    dfg0_s = sel(dfg0, a + 3)
    dfg0_sd = dfg0_s.astype(dtype)
    for k in range(3):
        h0tap = _rows(res["h0"], lo - 4, a + 3 + (k - 1), b - 3 + (k - 1))
        dW[f"kfg0_{k}"] = _dot_rows(h0tap, dfg0_sd)
    dW["cond_w0"] = _dot_rows(_rows(c, co, a + 3, b - 3), dfg0_sd)
    dW["cond_b0"] = _rowsum(dfg0_s)
    dc = dc + jax.lax.dot_general(dfg0.astype(dtype), W["cond_w"][0],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)

    # dh0 over [a+4, b-4): transposed layer-0 conv + the residual add
    dh0 = (_conv3t(dfg0.astype(dtype), a + 3, W["kfg"][0], lo=a + 4,
                   hi=b - 4, d=1)
           + _rows(dh1, a + 3, a + 4, b - 4) * SQRT_HALF)
    h0m = _rows(res["h0"], lo - 4, a + 4, b - 4)
    # h0 was masked outside [0, T) in the forward: zero those rows' grads
    dpre0 = validf(dh0 * (h0m.astype(f32) > 0).astype(f32), a + 4)
    dpre0_s = sel(dpre0, a + 4)
    dpre0_sd = dpre0_s.astype(dtype)
    for k in range(3):
        xtap = _rows(x, xo, a + 4 + (k - 1), b - 4 + (k - 1))
        dW[f"front_{k}"] = _dot_rows(xtap, dpre0_sd)
    dW["front_b"] = _rowsum(dpre0_s)
    dx = _conv3t(dpre0.astype(dtype), a + 4, W["front_w"], lo=a + 5,
                 hi=b - 5, d=1)
    return dx, dc, dW


def _pair_kernel_bwd(ut_ref, uh_ref, vt_ref, vh_ref, cat_ref, cah_ref,
                     cbt_ref, cbh_ref, gut_ref, guh_ref, gvt_ref, gvh_ref,
                     gr_ref, gq_ref, gh_ref,
                     front_w, front_b, kfg, cond_w, cond_b, res_w, res_b,
                     skip_w, skip_b, fin_w, fin_b, zw, zb, an_s, an_b,
                     du_out, dv_out, dca_out, dcb_out,
                     d_front_w, d_front_b, d_kfg, d_cond_w, d_cond_b,
                     d_res_w, d_res_b, d_skip_w, d_skip_b, d_fin_w,
                     d_fin_b, d_zw, d_zb, d_an_s, d_an_b,
                     *, t_tile: int, n_t: int, T: int):
    """Backward of the training flow pair over one time tile.

    Recomputes the forward from (u, v, c_a, c_b) windows, runs the full
    gradient chain in VMEM, writes du/dv/dc_a/dc_b for the tile's own
    rows, and ACCUMULATES every weight gradient in fp32 across grid
    steps (grid must be sequential — 'arbitrary' semantics)."""
    g = pl.program_id(0)
    f32 = jnp.float32
    H = BHALO
    dtype = ut_ref.dtype
    u = _win_cat(ut_ref, uh_ref, H)
    v = _win_cat(vt_ref, vh_ref, H)
    ca = _win_cat(cat_ref, cah_ref, H)
    cb = _win_cat(cbt_ref, cbh_ref, H)
    gu = _win_cat(gut_ref, guh_ref, H).astype(f32)
    gv = _win_cat(gvt_ref, gvh_ref, H).astype(f32)
    gr = gr_ref[0, 0]
    gq = gq_ref[0, 0]
    gh = gh_ref[0, 0]
    L = u.shape[0]
    tile_start = (g % n_t) * t_tile
    row0 = tile_start - H

    @pl.when(g == 0)
    def _zero():
        for ref in (d_front_w, d_front_b, d_kfg, d_cond_w, d_cond_b,
                    d_res_w, d_res_b, d_skip_w, d_skip_b, d_fin_w,
                    d_fin_b, d_zw, d_zb, d_an_s, d_an_b):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    def sel(x, off: int):
        n = x.shape[0]
        w = off + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        ok = (w >= H) & (w < H + t_tile) & (row0 + w < T)
        return jnp.where(ok, x, jnp.zeros_like(x))

    def valid(x, off: int):
        return _mask_valid(x, row0 + off, T)

    def flow_w(fi):
        return dict(front_w=front_w[fi], front_b=front_b[fi], kfg=kfg[fi],
                    cond_w=cond_w[fi], cond_b=cond_b[fi], res_w=res_w[fi],
                    res_b=res_b[fi], skip_w=skip_w[fi], skip_b=skip_b[fi],
                    fin_w=fin_w[fi], fin_b=fin_b[fi], zw=zw[fi],
                    zb=zb[fi])

    # ---------------- forward recompute -------------------------------
    u0 = (u.astype(f32) + an_b[0, 0].astype(f32)) * an_s[0, 0].astype(f32)
    v0 = (v.astype(f32) + an_b[0, 1].astype(f32)) * an_s[0, 1].astype(f32)
    u0 = valid(u0.astype(dtype), 0)      # masked net input (fwd parity)

    O1 = (H - 15, L - (H - 15))          # N1 out region (v3 over O2+-5)
    net1, res1 = _net_fwd_res(u0, 0, ca, 0, flow_w(0), lo=O1[0], hi=O1[1],
                              row0=row0, T=T, dtype=dtype)
    r_in = u.shape[-1]
    ls1, t1 = net1[:, :r_in], net1[:, r_in:]
    e1 = jnp.exp(-ls1)
    v2 = (_rows(v0, 0, O1[0], O1[1]) - t1) * e1
    v3 = (v2 + an_b[1, 0].astype(f32)) * an_s[1, 0].astype(f32)
    v3m = valid(v3.astype(dtype), O1[0])  # buffer offset O1[0]

    O2 = (H - 10, L - (H - 10))          # N2 out region (dnet2 tile+-10)
    net2, res2 = _net_fwd_res(v3m, O1[0], cb, 0, flow_w(1), lo=O2[0],
                              hi=O2[1], row0=row0, T=T, dtype=dtype)
    ls2, t2 = net2[:, :r_in], net2[:, r_in:]
    e2 = jnp.exp(-ls2)
    u2 = ((_rows(u0, 0, O2[0], O2[1]).astype(f32)
           + an_b[1, 1].astype(f32)) * an_s[1, 1].astype(f32))
    u3 = (u2 - t2) * e2

    m = jnp.asarray(HINGE_MARGIN, f32)

    def dls_scalar_terms(ls, off: int):
        """d(raw)/d ls = -gr, d(sumsq)/d ls = 2 ls gq, d(hinge)/d ls =
        2 gh relu(|ls|-m) sign(ls) — at every VALID row."""
        t_ = (-gr + gq * 2.0 * ls
              + gh * 2.0 * jnp.maximum(jnp.abs(ls) - m, 0.0)
              * jnp.sign(ls))
        return valid(t_, off)

    # ---------------- backward: odd coupling (N2) ---------------------
    gu2 = _rows(gu, 0, O2[0], O2[1])
    dls2 = -gu2 * u3 + dls_scalar_terms(ls2, O2[0])
    dt2 = -gu2 * e2
    dnet2 = jnp.concatenate([dls2, dt2], axis=-1)
    dv3m, dcb_c, dW2 = _net_bwd(dnet2, O2[0], O2[1], v3m, O1[0], cb, 0,
                                flow_w(1), res2, O2[0], sel=sel,
                                validf=valid, dtype=dtype)
    # dv3 over [H-5, L-(H-5)): output cotangent + masked net-input grad
    A1 = (H - 5, L - (H - 5))
    dv3 = (_rows(gv, 0, A1[0], A1[1])
           + valid(_rows(dv3m, O2[0] + 5, A1[0], A1[1]), A1[0]))

    # odd ActNorm half0 (on v): v3 = (v2 + b) * s
    def _ansum(x):
        return jnp.sum(x.astype(f32), axis=0, keepdims=True)

    v2a = _rows(v2, O1[0], A1[0], A1[1])
    d_an_s[1, 0] += _ansum(sel(dv3 * (v2a + an_b[1, 0].astype(f32)),
                               A1[0]))
    d_an_b[1, 0] += _ansum(sel(dv3 * an_s[1, 0].astype(f32), A1[0]))
    dv2 = dv3 * an_s[1, 0].astype(f32)

    # even coupling's affine: v2 = (v0 - t1) * e1
    e1a = _rows(e1, O1[0], A1[0], A1[1])
    ls1a = _rows(ls1, O1[0], A1[0], A1[1])
    dls1 = -dv2 * v2a + dls_scalar_terms(ls1a, A1[0])
    dt1 = -dv2 * e1a
    dnet1 = jnp.concatenate([dls1, dt1], axis=-1)
    du0m, dca_c, dW1 = _net_bwd(dnet1, A1[0], A1[1], u0, 0, ca, 0,
                                flow_w(0), res1, O1[0], sel=sel,
                                validf=valid, dtype=dtype)

    # odd ActNorm half1 (on u): u2 = (u0 + b) * s; du0m path via N1 input
    Tr = (H, L - H)
    gu_t = _rows(gu2, O2[0], Tr[0], Tr[1])
    du2 = gu_t * _rows(e2, O2[0], Tr[0], Tr[1])
    u0t = _rows(u0, 0, Tr[0], Tr[1]).astype(f32)
    d_an_s[1, 1] += _ansum(sel(du2 * (u0t + an_b[1, 1].astype(f32)),
                               Tr[0]))
    d_an_b[1, 1] += _ansum(sel(du2 * an_s[1, 1].astype(f32), Tr[0]))
    du0 = (_rows(du0m, A1[0] + 5, Tr[0], Tr[1])
           + du2 * an_s[1, 1].astype(f32))
    du0 = valid(du0, Tr[0])              # backward of the u0 mask

    # even ActNorm: u0 = (u + b) * s, v0 = (v + b) * s
    ut_ = _rows(u, 0, Tr[0], Tr[1]).astype(f32)
    d_an_s[0, 0] += _ansum(sel(du0 * (ut_ + an_b[0, 0].astype(f32)),
                               Tr[0]))
    d_an_b[0, 0] += _ansum(sel(du0 * an_s[0, 0].astype(f32), Tr[0]))
    du = du0 * an_s[0, 0].astype(f32)

    dv0 = _rows(dv2 * e1a, A1[0], Tr[0], Tr[1])
    vt_ = _rows(v, 0, Tr[0], Tr[1]).astype(f32)
    d_an_s[0, 1] += _ansum(sel(dv0 * (vt_ + an_b[0, 1].astype(f32)),
                               Tr[0]))
    d_an_b[0, 1] += _ansum(sel(dv0 * an_s[0, 1].astype(f32), Tr[0]))
    dv = dv0 * an_s[0, 1].astype(f32)

    # ---------------- emit tensor grads (tile rows) -------------------
    du_out[0] = du.astype(dtype)
    dv_out[0] = dv.astype(dtype)
    dca_out[0] = _rows(dca_c, A1[0] + 3, Tr[0], Tr[1]).astype(dtype)
    dcb_out[0] = _rows(dcb_c, O2[0] + 3, Tr[0], Tr[1]).astype(dtype)

    # ---------------- accumulate weight grads -------------------------
    for fi, dW in ((0, dW1), (1, dW2)):
        for k in range(3):
            d_front_w[fi, k] += dW[f"front_{k}"]
            d_kfg[fi, 0, k] += dW[f"kfg0_{k}"]
            d_kfg[fi, 1, k] += dW[f"kfg1_{k}"]
        d_front_b[fi] += dW["front_b"]
        d_cond_w[fi, 0] += dW["cond_w0"]
        d_cond_w[fi, 1] += dW["cond_w1"]
        d_cond_b[fi, 0] += dW["cond_b0"]
        d_cond_b[fi, 1] += dW["cond_b1"]
        d_res_w[fi] += dW["res_w"]
        d_res_b[fi] += dW["res_b"]
        d_skip_w[fi, 0] += dW["skip_w0"]
        d_skip_w[fi, 1] += dW["skip_w1"]
        d_skip_b[fi, 0] += dW["skip_b0"]
        d_skip_b[fi, 1] += dW["skip_b1"]
        d_fin_w[fi] += dW["fin_w"]
        d_fin_b[fi] += dW["fin_b"]
        d_zw[fi] += dW["zw"]
        d_zb[fi] += dW["zb"]


def fused_pair_train_bwd(u, v, c_a, c_b, gu, gv, gr, gq, gh, operands, *,
                         t_tile: int = 0, interpret: bool = False):
    """Full backward of the training pair step.  Returns
    (d_operands, du, dv, dc_a, dc_b) where d_operands matches
    pair_forward_operands' tuple structure (weight grads cast to the
    operand dtypes; the outer autodiff chains them through the folding
    to the raw params)."""
    B, T, R_in = u.shape
    dtype = u.dtype
    H = BHALO
    t_tile, n_t, T_pad = _fit_tile(T, t_tile or TRAIN_BWD_TT, 16, H)

    ut, uh = _tiles_and_halos(u, t_tile, n_t, T_pad, H)
    vt, vh = _tiles_and_halos(v, t_tile, n_t, T_pad, H)
    cat, cah = _tiles_and_halos(c_a, t_tile, n_t, T_pad, H)
    cbt, cbh = _tiles_and_halos(c_b, t_tile, n_t, T_pad, H)
    gut, guh = _tiles_and_halos(gu.astype(dtype), t_tile, n_t, T_pad, H)
    gvt, gvh = _tiles_and_halos(gv.astype(dtype), t_tile, n_t, T_pad, H)
    Cc = c_a.shape[-1]
    R = operands[0].shape[-1]            # front_w [2, 3, R_in, R]

    kernel = functools.partial(_pair_kernel_bwd, t_tile=t_tile, n_t=n_t,
                               T=T)
    grid = (B * n_t,)

    def in_map(g):
        return (g // n_t, g % n_t, 0, 0)

    def out_map(g):
        return (g // n_t, g % n_t, 0)

    def tile_spec(C):
        return pl.BlockSpec((1, 1, t_tile, C), in_map,
                            memory_space=pltpu.VMEM)

    def halo_spec(C):
        return pl.BlockSpec((1, 1, 2 * H, C), in_map,
                            memory_space=pltpu.VMEM)

    def acc_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    sspec = pl.BlockSpec((1, 1), lambda g: (0, 0),
                         memory_space=pltpu.SMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    acc_shapes = [
        jax.ShapeDtypeStruct((2, 3, R_in, R), f32),       # d_front_w
        jax.ShapeDtypeStruct((2, R), f32),                # d_front_b
        jax.ShapeDtypeStruct((2, 2, 3, R, 2 * R), f32),   # d_kfg
        jax.ShapeDtypeStruct((2, 2, Cc, 2 * R), f32),     # d_cond_w
        jax.ShapeDtypeStruct((2, 2, 2 * R), f32),         # d_cond_b
        jax.ShapeDtypeStruct((2, R, R), f32),             # d_res_w
        jax.ShapeDtypeStruct((2, R), f32),                # d_res_b
        jax.ShapeDtypeStruct((2, 2, R, R), f32),          # d_skip_w
        jax.ShapeDtypeStruct((2, 2, R), f32),             # d_skip_b
        jax.ShapeDtypeStruct((2, R, R), f32),             # d_fin_w
        jax.ShapeDtypeStruct((2, R), f32),                # d_fin_b
        jax.ShapeDtypeStruct((2, R, 2 * R_in), f32),      # d_zw
        jax.ShapeDtypeStruct((2, 2 * R_in), f32),         # d_zb
        jax.ShapeDtypeStruct((2, 2, 1, R_in), f32),       # d_an_s
        jax.ShapeDtypeStruct((2, 2, 1, R_in), f32),       # d_an_b
    ]
    flops_net = 2 * T * (2 * 3 * 256 * 512 + 2 * Cc * 512 + 2 * 256 * 256
                         + 256 * 256 + 3 * R_in * 256 + 256 * 2 * R_in)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(Cc), halo_spec(Cc),
            tile_spec(Cc), halo_spec(Cc),
            tile_spec(R_in), halo_spec(R_in),
            tile_spec(R_in), halo_spec(R_in),
            sspec, sspec, sspec,
        ] + [wspec] * len(operands),
        out_specs=[
            pl.BlockSpec((1, t_tile, R_in), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, R_in), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, Cc), out_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, Cc), out_map,
                         memory_space=pltpu.VMEM),
        ] + [acc_spec(s.shape) for s in acc_shapes],
        out_shape=[jax.ShapeDtypeStruct((B, T_pad, R_in), dtype),
                   jax.ShapeDtypeStruct((B, T_pad, R_in), dtype),
                   jax.ShapeDtypeStruct((B, T_pad, Cc), dtype),
                   jax.ShapeDtypeStruct((B, T_pad, Cc), dtype)]
        + acc_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * flops_net,
            bytes_accessed=2 * (ut.size + vt.size + cat.size + cbt.size)
            * max(dtype.itemsize, 1),
            transcendentals=2 * B * T * 512 * 4,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # accumulators revisit
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(ut, uh, vt, vh, cat, cah, cbt, cbh, gut, guh, gvt, gvh,
      jnp.asarray(gr, f32).reshape(1, 1), jnp.asarray(gq, f32
                                                      ).reshape(1, 1),
      jnp.asarray(gh, f32).reshape(1, 1), *operands)
    du, dv, dca, dcb = outs[:4]
    accs = outs[4:]
    if T_pad != T:
        du, dv, dca, dcb = (du[:, :T], dv[:, :T], dca[:, :T], dcb[:, :T])
    accs = list(accs[:-2]) + [accs[-2][:, :, 0], accs[-1][:, :, 0]]
    d_ops = tuple(a.astype(op.dtype) for a, op in zip(accs, operands))
    return d_ops, du, dv, dca.astype(c_a.dtype), dcb.astype(c_b.dtype)
