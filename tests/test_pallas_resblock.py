"""Fused Pallas gated-ResBlock kernel vs the XLA path (interpret mode on
CPU; the TPU-compiled path is exercised by bench/e2e on hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.models.modules import (_cond_fg, _fused_fg_kernel,
                                           _res_layer, init_wavenet)
from flowavenet_tpu.ops.conv import wn_kernel
from flowavenet_tpu.ops.pallas_resblock import fused_gated_resblock


def _layer(key, r=16, cc=8):
    p = init_wavenet(key, in_channels=4, out_channels=8, num_layers=1,
                     residual_channels=r, cin_channels=cc)
    return p["layers"][0]


@pytest.mark.parametrize("causal,dilation", [(False, 1), (False, 3),
                                             (True, 1), (True, 3)])
def test_kernel_matches_xla(key, rng, causal, dilation):
    r, cc, B, T = 16, 8, 2, 64
    layer = _layer(key, r, cc)
    # randomize so outputs are non-trivial
    layer = jax.tree.map(
        lambda l: l + jnp.asarray(0.2 * rng.randn(*l.shape), l.dtype), layer)
    h = jnp.asarray(rng.randn(B, T, r), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, cc), jnp.float32)

    ref_h, ref_s = _res_layer(h, c, None, layer, dilation=dilation,
                              causal=causal, compute_dtype=jnp.float32)

    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])
    cond = _cond_fg(c, None, layer, b)
    out_h, out_s = fused_gated_resblock(
        h, cond, k, wn_kernel(layer["res"])[0], layer["res"]["b"],
        wn_kernel(layer["skip"])[0], layer["skip"]["b"],
        dilation=dilation, causal=causal, t_tile=32, interpret=True)

    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)


def test_kernel_tile_fallback(key, rng):
    # T not divisible by the requested tile: kernel halves the tile
    r, cc, B, T = 8, 4, 1, 48
    layer = _layer(key, r, cc)
    h = jnp.asarray(rng.randn(B, T, r), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, cc), jnp.float32)
    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])
    cond = _cond_fg(c, None, layer, b)
    out_h, out_s = fused_gated_resblock(
        h, cond, k, wn_kernel(layer["res"])[0], layer["res"]["b"],
        wn_kernel(layer["skip"])[0], layer["skip"]["b"],
        dilation=1, causal=False, t_tile=32, interpret=True)
    ref_h, ref_s = _res_layer(h, c, None, layer, dilation=1, causal=False,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)


# NOTE: the per-resblock kernels are no longer routed in-model (the fused
# pair-flow kernel in ops/pallas_flow.py supersedes them; see
# tests/test_pallas_flow.py::test_model_routing_matches_xla for the in-model
# equivalence of the routed path).  The tests here cover them as standalone
# ops, including the custom VJP.


def test_wavenet_with_pallas_matches_xla(key, rng):
    """apply_wavenet(use_pallas=True) (interpret) == the plain XLA path."""
    import flowavenet_tpu.ops.pallas_resblock as pr
    from flowavenet_tpu.models.modules import apply_wavenet, init_wavenet

    params = init_wavenet(key, in_channels=2, out_channels=4, num_layers=2,
                          residual_channels=16, cin_channels=8)
    params = jax.tree.map(
        lambda l: l + jnp.asarray(0.1 * rng.randn(*l.shape), l.dtype),
        params)
    x = jnp.asarray(rng.randn(1, 64, 2), jnp.float32)
    c = jnp.asarray(rng.rand(1, 64, 8), jnp.float32)
    ref = apply_wavenet(params, x, c, causal=False)

    orig, orig2 = pr.fused_gated_resblock, pr.fused_gated_resblock_v2
    try:
        pr.fused_gated_resblock = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        pr.fused_gated_resblock_v2 = lambda *a, **k: orig2(
            *a, **{**k, "interpret": True})
        out = apply_wavenet(params, x, c, causal=False, use_pallas=True)
    finally:
        pr.fused_gated_resblock, pr.fused_gated_resblock_v2 = orig, orig2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_xla_grads(key, rng):
    """Grads through the fused kernel (Pallas fwd interpret + XLA bwd with
    recompute) must match autodiff through the plain XLA path."""
    r, cc, B, T = 16, 8, 2, 64
    layer = _layer(key, r, cc)
    layer = jax.tree.map(
        lambda l: l + jnp.asarray(0.2 * rng.randn(*l.shape), l.dtype), layer)
    h = jnp.asarray(rng.randn(B, T, r), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, cc), jnp.float32)
    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])
    cond = _cond_fg(c, None, layer, b)
    wr, br = wn_kernel(layer["res"])[0], layer["res"]["b"]
    ws, bs = wn_kernel(layer["skip"])[0], layer["skip"]["b"]

    def loss_fused(args):
        h_, cond_, k_, wr_, br_, ws_, bs_ = args
        hn, sk = fused_gated_resblock(h_, cond_, k_, wr_, br_, ws_, bs_,
                                      dilation=3, causal=False, t_tile=32,
                                      interpret=True)
        return jnp.sum(hn * hn) + jnp.sum(jnp.sin(sk))

    def loss_xla(args):
        h_, cond_, k_, wr_, br_, ws_, bs_ = args
        import flowavenet_tpu.ops.pallas_resblock as pr
        fg = pr._dilated_conv_taps(h_, k_, 3, False) + cond_
        gated = jnp.tanh(fg[..., :r]) * jax.nn.sigmoid(fg[..., r:])
        res = jnp.einsum("btr,rd->btd", gated, wr_) + br_
        hn = (h_ + res) * np.sqrt(0.5)
        sk = jnp.einsum("btr,rs->bts", gated, ws_) + bs_
        return jnp.sum(hn * hn) + jnp.sum(jnp.sin(sk))

    args = (h, cond, k, wr, br, ws, bs)
    va, ga = jax.value_and_grad(loss_fused)(args)
    vb, gb = jax.value_and_grad(loss_xla)(args)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal,dilation", [(False, 1), (True, 3)])
def test_v2_kernel_matches_xla(key, rng, causal, dilation):
    from flowavenet_tpu.ops.pallas_resblock import fused_gated_resblock_v2

    r, cc, B, T = 16, 8, 2, 96
    layer = _layer(key, r, cc)
    layer = jax.tree.map(
        lambda l: l + jnp.asarray(0.2 * rng.randn(*l.shape), l.dtype), layer)
    h = jnp.asarray(rng.randn(B, T, r), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, cc), jnp.float32)

    ref_h, ref_s = _res_layer(h, c, None, layer, dilation=dilation,
                              causal=causal, compute_dtype=jnp.float32)

    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])
    kc, bc = _fused_fg_kernel(layer["filter_c"], layer["gate_c"])
    out_h, out_s = fused_gated_resblock_v2(
        h, c, k, kc[0], bc + b,
        wn_kernel(layer["res"])[0], layer["res"]["b"],
        wn_kernel(layer["skip"])[0], layer["skip"]["b"],
        dilation=dilation, causal=causal, t_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)


def test_v2_custom_vjp_grads(key, rng):
    from flowavenet_tpu.ops.pallas_resblock import fused_gated_resblock_v2
    import flowavenet_tpu.ops.pallas_resblock as pr

    r, cc, B, T = 8, 4, 1, 64
    layer = _layer(key, r, cc)
    h = jnp.asarray(rng.randn(B, T, r), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, cc), jnp.float32)
    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])
    kc, bc = _fused_fg_kernel(layer["filter_c"], layer["gate_c"])
    args = (h, c, k, kc[0], bc + b, wn_kernel(layer["res"])[0],
            layer["res"]["b"], wn_kernel(layer["skip"])[0],
            layer["skip"]["b"])

    def loss_v2(a):
        hn, sk = fused_gated_resblock_v2(*a, dilation=3, causal=False,
                                         t_tile=32, interpret=True)
        return jnp.sum(hn * hn) + jnp.sum(jnp.sin(sk))

    def loss_ref(a):
        h_, c_, k_, kc_, ball_, wr_, br_, ws_, bs_ = a
        fg = pr._dilated_conv_taps(h_, k_, 3, False) \
            + jnp.einsum("btc,cd->btd", c_, kc_) + ball_
        gated = jnp.tanh(fg[..., :r]) * jax.nn.sigmoid(fg[..., r:])
        hn = (h_ + jnp.einsum("btr,rd->btd", gated, wr_) + br_) * np.sqrt(0.5)
        sk = jnp.einsum("btr,rs->bts", gated, ws_) + bs_
        return jnp.sum(hn * hn) + jnp.sum(jnp.sin(sk))

    va, ga = jax.value_and_grad(loss_v2)(args)
    vb, gb = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)


def test_kernel_unaligned_T(key, rng):
    """T not a multiple of the sublane quantum (late blocks, e.g. T=86):
    padded-tile path must stay exact."""
    from flowavenet_tpu.ops.pallas_resblock import fused_gated_resblock_v2

    r, cc, B, T = 8, 4, 2, 86
    layer = _layer(key, r, cc)
    h = jnp.asarray(rng.randn(B, T, r), jnp.float32)
    c = jnp.asarray(rng.randn(B, T, cc), jnp.float32)
    ref_h, ref_s = _res_layer(h, c, None, layer, dilation=3, causal=False,
                              compute_dtype=jnp.float32)
    k, b = _fused_fg_kernel(layer["filter"], layer["gate"])
    kc, bc = _fused_fg_kernel(layer["filter_c"], layer["gate_c"])
    out_h, out_s = fused_gated_resblock_v2(
        h, c, k, kc[0], bc + b, wn_kernel(layer["res"])[0],
        layer["res"]["b"], wn_kernel(layer["skip"])[0], layer["skip"]["b"],
        dilation=3, causal=False, t_tile=32, interpret=True)
    assert out_h.shape == ref_h.shape
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
