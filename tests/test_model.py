"""Model-level tests: full invertibility, DDI, logdet, bf16 path, scan parity.

SURVEY.md §4 items 1-3.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.config import tiny
from flowavenet_tpu.models.flowavenet import (ddi, forward, init_flowavenet,
                                              loss_fn, reverse)

CFG = tiny().model  # 2 blocks x 2 flows, filter 32


def _data(rng, cfg, B=2, T=1024, randomize=None, key=None):
    hop = cfg.hop_size
    x = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    c = jnp.asarray(rng.rand(B, T // hop, cfg.num_mels), jnp.float32)
    return x, c


def _randomized_params(key, cfg, rng, scale=0.1):
    """Random (non-identity) params so invertibility is tested non-trivially."""
    params = init_flowavenet(key, cfg)
    leaves, treedef = jax.tree.flatten(params)
    out = []
    r = np.random.RandomState(7)
    for leaf in leaves:
        noise = jnp.asarray(scale * r.randn(*leaf.shape), leaf.dtype)
        out.append(leaf + noise)
    return jax.tree.unflatten(treedef, out)


def test_forward_shapes_and_dtypes(key, rng):
    params = init_flowavenet(key, CFG)
    x, c = _data(rng, CFG)
    log_p, logdet = forward(params, CFG, x, c)
    assert log_p.dtype == jnp.float32 and logdet.dtype == jnp.float32
    assert log_p.shape == () and logdet.shape == ()


def test_full_model_invertibility(key, rng):
    params = _randomized_params(key, CFG, rng)
    x, c = _data(rng, CFG)
    # reverse(z) should reconstruct x given z = full forward latent.
    # Build the latent by running the forward flow manually.
    from flowavenet_tpu.models.flowavenet import (_prepare_cond,
                                                  block_forward)
    cc, _ = _prepare_cond(params, CFG, c, None, jnp.float32)
    out = x
    for bp in params["blocks"]:
        out, cc, _, _ = block_forward(bp, CFG, out, cc, None)
    # out is the fully squeezed latent; reverse expects unsqueezed z
    from flowavenet_tpu.ops.squeeze import unsqueeze
    z = out
    for _ in range(CFG.n_block):
        z = unsqueeze(z)
    x_rec = reverse(params, CFG, z, c)
    np.testing.assert_allclose(np.array(x_rec), np.array(x),
                               rtol=1e-4, atol=1e-4)


def test_ddi_whitens_each_actnorm_input(key, rng):
    params = init_flowavenet(key, CFG)
    x, c = _data(rng, CFG, B=4)
    new_params = ddi(params, CFG, x, c)
    # After DDI, re-running DDI must reproduce the same actnorm params
    # (since couplings are identity at init, the stats are unchanged).
    again = ddi(new_params, CFG, x, c)
    for bp_new, bp_again in zip(new_params["blocks"], again["blocks"]):
        np.testing.assert_allclose(
            np.array(bp_new["flows"]["actnorm"]["b"]),
            np.array(bp_again["flows"]["actnorm"]["b"]), atol=1e-4)
    # and the forward latent should be ~N(0,1)-ish scale per block at init
    log_p, logdet = forward(new_params, CFG, x, c)
    loss = -(log_p + logdet)
    assert np.isfinite(float(loss))


def test_model_logdet_vs_jacobian(key):
    # Tiny model, tiny shapes: full-Jacobian check of the whole flow.
    from flowavenet_tpu.config import ModelConfig
    cfg = ModelConfig(n_block=2, n_flow=2, n_layer=1, filter_size=8,
                      num_mels=2, upsample_scales=(2, 2))
    rng = np.random.RandomState(3)
    params = init_flowavenet(jax.random.PRNGKey(1), cfg)
    params = jax.tree.map(
        lambda l: l + jnp.asarray(0.1 * rng.randn(*l.shape), l.dtype), params)
    B, T = 1, 16
    x = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    c = jnp.asarray(rng.rand(B, T // 4, 2), jnp.float32)

    from flowavenet_tpu.models.flowavenet import _prepare_cond, block_forward

    def latent(v):
        out = v.reshape(B, T, 1)
        cc, _ = _prepare_cond(params, cfg, c, None, jnp.float32)
        ld = 0.0
        for bp in params["blocks"]:
            out, cc, _, d = block_forward(bp, cfg, out, cc, None)
        return out.ravel()

    def total_logdet(v):
        out = v.reshape(B, T, 1)
        cc, _ = _prepare_cond(params, cfg, c, None, jnp.float32)
        ld = jnp.asarray(0.0)
        for bp in params["blocks"]:
            out, cc, _, d = block_forward(bp, cfg, out, cc, None)
            ld = ld + d
        return ld

    J = jax.jacrev(latent)(x.ravel())
    expected = np.linalg.slogdet(np.array(J))[1] / (B * T)
    got = float(total_logdet(x.ravel()))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_bf16_close_to_fp32(key, rng):
    params = init_flowavenet(key, CFG)
    x, c = _data(rng, CFG)
    params = ddi(params, CFG, x, c)
    lp32, ld32 = forward(params, CFG, x, c, compute_dtype=jnp.float32)
    lp16, ld16 = forward(params, CFG, x, c, compute_dtype=jnp.bfloat16)
    assert abs(float(lp32) - float(lp16)) < 0.05
    assert abs(float(ld32) - float(ld16)) < 0.05


def test_global_conditioning_path(key, rng):
    from flowavenet_tpu.config import ModelConfig
    cfg = ModelConfig(n_block=2, n_flow=2, n_layer=1, filter_size=16,
                      gin_channels=4, n_speakers=3)
    params = init_flowavenet(key, cfg)
    x, c = _data(rng, cfg)
    g = jnp.asarray([0, 2], jnp.int32)
    log_p, logdet = forward(params, cfg, x, c, g)
    assert np.isfinite(float(log_p))
    # requires g when gin_channels > 0 (model.py:320-321)
    with pytest.raises(ValueError):
        forward(params, cfg, x, c, None)
    # reverse path with g runs and is inverse of forward at random params
    z = jnp.asarray(rng.randn(*x.shape), jnp.float32)
    wav = reverse(params, cfg, z, c, g)
    assert wav.shape == x.shape

    # the parity flag reproduces the reference's g-dropping bug: output
    # must then be independent of g
    cfg_bug = ModelConfig(n_block=2, n_flow=2, n_layer=1, filter_size=16,
                          gin_channels=4, n_speakers=3,
                          parity_drop_global_cond=True)
    lp0, _ = forward(params, cfg_bug, x, c, jnp.asarray([0, 0], jnp.int32))
    lp1, _ = forward(params, cfg_bug, x, c, jnp.asarray([1, 2], jnp.int32))
    assert float(lp0) == float(lp1)


def test_loss_fn_metrics(key, rng):
    params = init_flowavenet(key, CFG)
    x, c = _data(rng, CFG)
    loss, aux = loss_fn(params, CFG, x, c)
    assert float(loss) == -(float(aux["log_p"]) + float(aux["logdet"]))
    np.testing.assert_allclose(float(aux["bits_per_dim"]),
                               float(loss) / np.log(2.0), rtol=1e-6)


def test_jit_and_grad(key, rng):
    params = init_flowavenet(key, CFG)
    x, c = _data(rng, CFG)

    @jax.jit
    def step(p, x, c):
        return jax.value_and_grad(lambda p: loss_fn(p, CFG, x, c)[0])(p)

    loss, grads = step(params, x, c)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.array(g))) for g in flat)
    # zero-conv kernel must receive gradient (scale grad is exactly 0 at
    # zero-init since the conv output is 0 — true in the reference too)
    g_w = grads["blocks"][0]["flows"]["coupling"]["zero"]["w"]
    assert float(jnp.abs(g_w).sum()) > 0


def test_pair_scan_matches_generic(key, rng):
    """The pair-scan fast path must match the generic change_order path
    exactly (same flows, same params)."""
    import jax.numpy as jnp
    from flowavenet_tpu.models.flowavenet import (_flow_step_fwd,
                                                  _flow_step_rev,
                                                  block_forward,
                                                  block_reverse)
    from flowavenet_tpu.ops.squeeze import squeeze

    cfg = CFG  # n_flow = 2 (even) -> block_* use the pair path
    params = _randomized_params(key, cfg, rng)
    bp = params["blocks"][0]
    x = jnp.asarray(rng.randn(2, 512, 1), jnp.float32)
    c = jnp.asarray(rng.randn(2, 512, cfg.num_mels), jnp.float32)

    out, c_out, _, ld = block_forward(bp, cfg, x, c, None)

    # generic path, run manually
    xs, cs = squeeze(x), squeeze(c)
    (xg, cg), (lds, _) = jax.lax.scan(_flow_step_fwd(cfg, False), (xs, cs),
                                      bp["flows"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(xg),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(cg),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(ld), float(jnp.sum(lds)), rtol=1e-5)

    # and reverse inverts forward through the pair path
    xr, _, _ = block_reverse(bp, cfg, out, c_out, None)
    from flowavenet_tpu.ops.squeeze import unsqueeze
    np.testing.assert_allclose(np.asarray(xr), np.asarray(unsqueeze(xs)),
                               rtol=1e-4, atol=1e-4)


def test_nll_golden_regression():
    """Pinned NLL on a fixed seed/params/input: guards the whole numeric
    stack (init -> DDI -> forward) against silent drift across refactors
    (SURVEY §4 item 5).  Regenerate via the snippet in the fixture's git
    history only when a deliberate numeric change is made."""
    import os
    fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                              "nll_golden.npz"))
    from flowavenet_tpu.config import ModelConfig
    from flowavenet_tpu.models.flowavenet import ddi as ddi_fn

    cfg = ModelConfig(n_block=3, n_flow=2, n_layer=2, filter_size=16,
                      num_mels=8, upsample_scales=(4, 4))
    params = init_flowavenet(jax.random.PRNGKey(1234), cfg)
    r = np.random.RandomState(99)
    x = jnp.asarray(r.randn(2, 512, 1), jnp.float32)
    c = jnp.asarray(r.rand(2, 32, 8), jnp.float32)
    params = ddi_fn(params, cfg, x, c)
    lp, ld = forward(params, cfg, x, c)
    np.testing.assert_allclose(float(lp), float(fx["log_p"]), rtol=2e-5)
    np.testing.assert_allclose(float(ld), float(fx["logdet"]), rtol=2e-5)


def test_logs_clamp_bounds_and_inverts(key, rng):
    """ModelConfig.logs_clamp: the soft-bounded family stays exactly
    invertible, its stats respect the bound, and its logdet still matches
    the analytic jacobian (the bound feeds both the transform AND the
    logdet)."""
    import dataclasses

    from flowavenet_tpu.models.flowavenet import _prepare_cond, block_forward
    from flowavenet_tpu.ops.squeeze import unsqueeze

    cfg = dataclasses.replace(CFG, logs_clamp=0.25)
    # big random params so unbounded log_s would exceed the clamp
    params = _randomized_params(key, cfg, rng, scale=0.5)
    x, c = _data(rng, cfg, B=1, T=512)

    log_p, logdet, stats = forward(params, cfg, x, c, return_stats=True)
    assert float(stats["max_log_s"]) <= 0.25 + 1e-6
    # sanity: the same params UNclamped actually exceed the bound
    _, _, st0 = forward(params, CFG, x, c, return_stats=True)
    assert float(st0["max_log_s"]) > 0.25

    # roundtrip through the full model
    cc, _ = _prepare_cond(params, cfg, c, None, jnp.float32)
    out = x
    for bp in params["blocks"]:
        out, cc, _, _ = block_forward(bp, cfg, out, cc, None)
    z = out
    for _ in range(cfg.n_block):
        z = unsqueeze(z)
    x_rec = reverse(params, cfg, z, c)
    # scale-0.5 params (needed to exceed the clamp) amplify fp32
    # roundtrip noise vs the scale-0.1 invertibility test above
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=5e-3, atol=5e-3)

    # logdet correctness under the clamp (tiny shapes, jacfwd)
    tcfg = dataclasses.replace(
        tiny().model, n_block=1, n_flow=2, filter_size=8, num_mels=2,
        upsample_scales=(2, 2), logs_clamp=0.25)
    tparams = _randomized_params(jax.random.PRNGKey(3), tcfg, rng, scale=0.5)
    B, T = 1, 16
    tx = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    tc = jnp.asarray(rng.rand(B, T // 4, 2), jnp.float32)

    def latent(v):
        out = v.reshape(B, T, 1)
        cc2, _ = _prepare_cond(tparams, tcfg, tc, None, jnp.float32)
        for bp in tparams["blocks"]:
            out, cc2, _, _ = block_forward(bp, tcfg, out, cc2, None)
        return out.ravel()

    def total_logdet(v):
        out = v.reshape(B, T, 1)
        cc2, _ = _prepare_cond(tparams, tcfg, tc, None, jnp.float32)
        ld = jnp.asarray(0.0)
        for bp in tparams["blocks"]:
            out, cc2, _, d = block_forward(bp, tcfg, out, cc2, None)
            ld = ld + d
        return ld

    J = jax.jacrev(latent)(tx.ravel())
    _, analytic_ld = np.linalg.slogdet(np.asarray(J))
    # block logdets are means over the tensor (model.py:80,135): scale up
    np.testing.assert_allclose(float(total_logdet(tx.ravel())) * (B * T),
                               analytic_ld, rtol=1e-4, atol=1e-4)
