"""Fused forward+backward training pair kernel (ops/pallas_flow_train.py).

The VJP is hand-derived Mosaic code, so these tests compare it against
XLA autodiff of the exact same math (fp32, interpret mode) — including
the log_s stat cotangents (logdet / L2 / hinge), edge masking at both
sequence ends, non-tile-aligned lengths (padding), and the full-model
loss_fn routing under FWN_TRAIN_KERNEL.

Reference gradient surface: /root/reference/train.py:35-60
(tf.gradients through model.py AffineCoupling / modules.py Wavenet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flowavenet_tpu.models.flowavenet as fwn
from flowavenet_tpu.config import tiny
from flowavenet_tpu.ops import pallas_flow as pf
from flowavenet_tpu.ops import pallas_flow_train as pft

CFG = tiny().model


@pytest.fixture
def pair_and_data():
    params = fwn.init_flowavenet(jax.random.PRNGKey(0), CFG)
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.RandomState(1)
    # perturb every leaf: fresh couplings are identities (zero conv),
    # which would make most gradient paths degenerate
    leaves = [jnp.asarray(np.asarray(l)
                          + 0.1 * rng.randn(*l.shape).astype(np.float32))
              for l in leaves]
    params = jax.tree.unflatten(treedef, leaves)
    pair = jax.tree.map(lambda l: l[0],
                        fwn._pair_params(params["blocks"][0]))
    return pair, rng


def _xla_pair_full(pair, u, v, ca, cb, margin):
    """XLA mirror of fused_pair_train_fwd (minus the max stat)."""
    ev = jax.tree.map(lambda l: l[0], pair)
    od = jax.tree.map(lambda l: l[1], pair)
    u1 = fwn._an_half(ev["actnorm"], 0, u)
    v1 = fwn._an_half(ev["actnorm"], 1, v)
    net = fwn.apply_wavenet(ev["coupling"], u1, ca, None, causal=False)
    ls1, t1 = jnp.split(net, 2, axis=2)
    v2 = (v1 - t1) * jnp.exp(-ls1)
    v3 = fwn._an_half(od["actnorm"], 0, v2)
    u2 = fwn._an_half(od["actnorm"], 1, u1)
    net2 = fwn.apply_wavenet(od["coupling"], v3, cb, None, causal=False)
    ls2, t2 = jnp.split(net2, 2, axis=2)
    u3 = (u2 - t2) * jnp.exp(-ls2)
    raw = jnp.sum(-ls1) + jnp.sum(-ls2)
    sq = jnp.sum(ls1 * ls1) + jnp.sum(ls2 * ls2)
    h1 = jnp.maximum(jnp.abs(ls1) - margin, 0.0)
    h2 = jnp.maximum(jnp.abs(ls2) - margin, 0.0)
    hq = jnp.sum(h1 * h1) + jnp.sum(h2 * h2)
    return u3, v3, raw, sq, hq


def _worst_rel(tree_a, tree_b):
    worst = 0.0
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
        a, b = np.asarray(a), np.asarray(b)
        worst = max(worst,
                    np.abs(a - b).max() / max(np.abs(a).max(), 1e-6))
    return worst


@pytest.mark.parametrize("T", [200, 1100])
def test_train_kernel_grads_match_xla(pair_and_data, T, monkeypatch):
    """Primal, stats, AND every gradient (params through the operand
    folding, u, v, c_a, c_b) of the fused training pair kernel match XLA
    autodiff at fp32.  T=200: one tile with both sequence edges inside
    it; T=1100: multiple backward tiles (512) + padded tail, exercising
    the cross-grid-step weight-grad accumulators."""
    monkeypatch.setattr(pft, "HINGE_MARGIN", 0.3)  # make the hinge live
    pair, rng = pair_and_data
    B = 2
    u = jnp.asarray(0.3 * rng.randn(B, T, 1), jnp.float32)
    v = jnp.asarray(0.3 * rng.randn(B, T, 1), jnp.float32)
    Cc = CFG.num_mels
    ca = jnp.asarray(rng.randn(B, T, Cc), jnp.float32)
    cb = jnp.asarray(rng.randn(B, T, Cc), jnp.float32)
    wu = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    wv = jnp.asarray(rng.randn(B, T, 1), jnp.float32)

    def loss_x(pair, u, v, ca, cb):
        u3, v3, raw, sq, hq = _xla_pair_full(pair, u, v, ca, cb, 0.3)
        return (jnp.sum(u3 * wu) + jnp.sum(v3 * wv) + 0.7 * raw
                + 0.11 * sq + 1.3 * hq)

    def loss_k(pair, u, v, ca, cb):
        ops = pf.pair_forward_operands(pair, jnp.float32)
        u3, v3, raw, mx, sq, hq = fwn._pair_train_fused(True, ops, u, v,
                                                        ca, cb)
        return (jnp.sum(u3 * wu) + jnp.sum(v3 * wv) + 0.7 * raw
                + 0.11 * sq + 1.3 * hq)

    lx = float(loss_x(pair, u, v, ca, cb))
    lk = float(loss_k(pair, u, v, ca, cb))
    assert abs(lx - lk) / abs(lx) < 1e-6

    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(pair, u, v, ca, cb)
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(pair, u, v, ca, cb)
    for name, a, b in zip(["pair", "u", "v", "ca", "cb"], gx, gk):
        assert _worst_rel(a, b) < 5e-5, name


def test_train_kernel_fwd_stats_exact(pair_and_data):
    """The extended forward kernel's stat outputs equal the XLA values
    (raw -log_s sum, sum log_s^2, hinge sum, max|log_s|)."""
    pair, rng = pair_and_data
    B, T = 2, 192
    u = jnp.asarray(0.3 * rng.randn(B, T, 1), jnp.float32)
    v = jnp.asarray(0.3 * rng.randn(B, T, 1), jnp.float32)
    Cc = CFG.num_mels
    ca = jnp.asarray(rng.randn(B, T, Cc), jnp.float32)
    cb = jnp.asarray(rng.randn(B, T, Cc), jnp.float32)
    ops = pf.pair_forward_operands(pair, jnp.float32)
    u3k, v3k, raw_k, mx_k, sq_k, hq_k = pft.fused_pair_train_fwd(
        u, v, ca, cb, ops, interpret=True)
    u3, v3, raw, sq, hq = _xla_pair_full(pair, u, v, ca, cb,
                                         pft.HINGE_MARGIN)
    np.testing.assert_allclose(np.asarray(u3k), np.asarray(u3),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(v3k), np.asarray(v3),
                               atol=2e-6)
    np.testing.assert_allclose(float(raw_k), float(raw), rtol=1e-6)
    np.testing.assert_allclose(float(sq_k), float(sq), rtol=1e-6)
    np.testing.assert_allclose(float(hq_k), float(hq), rtol=1e-6)
    assert float(mx_k) > 0.0  # perturbed couplings have nonzero log_s


def test_train_kernel_full_model_loss_and_grads(monkeypatch):
    """FWN_TRAIN_KERNEL routing inside block_forward: loss_fn total,
    divergence stats, and the full param-gradient tree match the XLA
    scan path on the tiny model (fp32, interpret)."""
    params = fwn.init_flowavenet(jax.random.PRNGKey(0), CFG)
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.RandomState(3)
    leaves = [jnp.asarray(np.asarray(l)
                          + 0.05 * rng.randn(*l.shape).astype(np.float32))
              for l in leaves]
    params = jax.tree.unflatten(treedef, leaves)
    B, T = 2, 2048
    x = jnp.asarray(0.3 * rng.randn(B, T, 1), jnp.float32)
    c = jnp.asarray(rng.rand(B, T // CFG.hop_size, CFG.num_mels),
                    jnp.float32)

    def run(kernel_on):
        monkeypatch.setattr(fwn, "TRAIN_KERNEL", kernel_on)
        monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", kernel_on)
        # route EVERY block (the production default 80 = block 0 only,
        # per the chip measurement; this test wants full coverage)
        monkeypatch.setattr(fwn, "TRAIN_KERNEL_MAX_CC", 10 ** 9)
        (l, aux), g = jax.value_and_grad(
            lambda p: fwn.loss_fn(p, CFG, x, c, logs_l2=0.05,
                                  logs_hinge=1.0), has_aux=True)(params)
        return float(l), aux, g

    l0, a0, g0 = run(False)
    l1, a1, g1 = run(True)
    assert abs(l0 - l1) / abs(l0) < 1e-6
    for k in ("loss", "logdet", "max_log_s", "logs_mean_sq",
              "logs_hinge"):
        np.testing.assert_allclose(float(a0[k]), float(a1[k]),
                                   rtol=1e-5, atol=1e-7)
    assert _worst_rel(g0, g1) < 5e-5
