"""Fused pair-flow reverse kernel (ops/pallas_flow.py): numerics vs the XLA
pair-scan, tiling/halo correctness, and in-model routing.

All kernel runs use interpret mode (CPU); the real-TPU path shares the exact
same kernel body.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.config import tiny
from flowavenet_tpu.models import flowavenet as fwn
from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse
from flowavenet_tpu.ops.pallas_flow import (fused_pair_reverse,
                                            pair_reverse_operands)
from flowavenet_tpu.ops.squeeze import squeeze

CFG = tiny().model  # n_flow=2 -> one pair per block


def _randomized(key, cfg, scale=0.1):
    params = init_flowavenet(key, cfg)
    leaves, treedef = jax.tree.flatten(params)
    r = np.random.RandomState(7)
    out = [l + jnp.asarray(scale * r.randn(*l.shape), l.dtype)
           for l in leaves]
    return jax.tree.unflatten(treedef, out)


def _xla_pair_reverse(bp, cfg, u, v, c_a, c_b):
    (u, v), _ = jax.lax.scan(
        fwn._pair_step_rev(cfg, c_a, c_b, None, None), (u, v),
        fwn._pair_params(bp), reverse=True)
    return u, v


@pytest.mark.parametrize("T,t_tile", [(128, 128), (192, 64), (96, 32)])
def test_pair_kernel_matches_xla(key, rng, T, t_tile):
    """Kernel == XLA pair-scan across tile boundaries (halo correctness) and
    ragged final tiles."""
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]

    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)

    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_reverse_operands(pair, dtype=jnp.float32)
    u_k, v_k = fused_pair_reverse(u, v, c_a, c_b, ops, t_tile=t_tile,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)


def test_pair_kernel_wider_channels(key, rng):
    """Block-1-style shapes: R_in=2, Cc=2*num_mels (and the >=8-channel
    matmul front path via a fatter custom config)."""
    cfg = dataclasses.replace(CFG, n_block=2)
    params = _randomized(key, cfg)
    bp = params["blocks"][1]                   # R_in=2, Cc=2*num_mels
    T = 128
    u = jnp.asarray(rng.randn(2, T, 2), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 2), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, 2 * cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, 2 * cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_reverse_operands(pair, dtype=jnp.float32)
    u_k, v_k = fused_pair_reverse(u, v, c_a, c_b, ops, t_tile=64,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T", [96, 192, 200])
def test_wino_pair_kernel_matches_xla(key, rng, T):
    """Winograd F(2,3) 6-plane variant == XLA pair-scan, incl. ragged tails
    and multi-tile phase alignment (T=200 is not a multiple of 48)."""
    from flowavenet_tpu.ops.pallas_flow import (fused_pair_reverse_wino,
                                                pair_reverse_operands_wino)
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_reverse_operands_wino(pair, dtype=jnp.float32)
    u_k, v_k = fused_pair_reverse_wino(u, v, c_a, c_b, ops, interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("T", [192, 384, 400])
def test_wino4_pair_kernel_matches_xla(key, rng, T):
    """Winograd F(4,3) 12-plane variant == XLA pair-scan, incl. ragged
    tails and phase alignment (T=400 is not a multiple of 48)."""
    from flowavenet_tpu.ops.pallas_flow import (fused_pair_reverse_wino,
                                                pair_reverse_operands_wino4)
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_reverse_operands_wino4(pair, dtype=jnp.float32)
    u_k, v_k = fused_pair_reverse_wino(u, v, c_a, c_b, ops, interpret=True,
                                       phases=12)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-3, atol=1e-3)


def test_wino4_hoisted_matches_xla(key, rng):
    """F(4,3) with hoisted conditioning == XLA pair-scan."""
    from flowavenet_tpu.ops.pallas_flow import (fused_pair_reverse_wino,
                                                pair_reverse_operands_wino4)
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 240
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops, (w_e, w_o) = pair_reverse_operands_wino4(pair, dtype=jnp.float32,
                                                  hoisted=True)
    ce = jnp.dot(c_a, w_e, preferred_element_type=jnp.float32)
    co = jnp.dot(c_b, w_o, preferred_element_type=jnp.float32)
    u_k, v_k = fused_pair_reverse_wino(u, v, ce, co, ops, interpret=True,
                                       phases=12, hoisted=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-3, atol=1e-3)


def test_int8_pair_kernel_close_to_xla(key, rng):
    """int8-fg direct kernel approximates the XLA pair-scan within
    quantization tolerance (per-channel weight int8 ~0.8% + activation
    int8 per tile; EXPERIMENTAL FWN_INT8 path)."""
    from flowavenet_tpu.ops.pallas_flow import pair_reverse_operands_int8
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 192
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_reverse_operands_int8(pair, dtype=jnp.float32)
    u_k, v_k = fused_pair_reverse(u, v, c_a, c_b, ops, t_tile=64,
                                  interpret=True, int8=True)
    for got, want in ((u_k, u_ref), (v_k, v_ref)):
        got, want = np.asarray(got), np.asarray(want)
        assert np.all(np.isfinite(got))
        denom = max(1e-6, float(np.abs(want).max()))
        rel = float(np.abs(got - want).max()) / denom
        corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
        assert rel < 0.08 and corr > 0.998, (rel, corr)


def test_int8_pair_kernel_prequantized_cond(key, rng):
    """PRE-quantized conditioning (int8 tiles + global act scales folded
    into the cond weight scales via ``c_scales``) matches the in-kernel
    per-tile-quant int8 route almost exactly: the only difference is the
    global-vs-per-tile activation scale."""
    from flowavenet_tpu.ops.conv import quantize_act
    from flowavenet_tpu.ops.pallas_flow import pair_reverse_operands_int8
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 192
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))

    ops = pair_reverse_operands_int8(pair, dtype=jnp.float32)
    u_k, v_k = fused_pair_reverse(u, v, c_a, c_b, ops, t_tile=64,
                                  interpret=True, int8=True)

    (qa, sa), (qb, sb) = quantize_act(c_a), quantize_act(c_b)
    ops_q = pair_reverse_operands_int8(pair, dtype=jnp.float32,
                                       c_scales=(sa, sb))
    u_q, v_q = fused_pair_reverse(u, v, qa, qb, ops_q, t_tile=64,
                                  interpret=True, int8=True)
    for got, want in ((u_q, u_k), (v_q, v_k)):
        got, want = np.asarray(got), np.asarray(want)
        assert np.all(np.isfinite(got))
        denom = max(1e-6, float(np.abs(want).max()))
        rel = float(np.abs(got - want).max()) / denom
        corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
        assert rel < 0.02 and corr > 0.9995, (rel, corr)


def test_wino_multi_tile(key, rng, monkeypatch):
    """Force several Winograd tiles (small WINO_T_TILE) so cross-tile halo
    and phase bookkeeping is covered."""
    from flowavenet_tpu.ops import pallas_flow as pf
    monkeypatch.setattr(pf, "WINO_T_TILE", 96)
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 336  # 3.5 tiles of 96
    u = jnp.asarray(rng.randn(1, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(1, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(1, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(1, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pf.pair_reverse_operands_wino(pair, dtype=jnp.float32)
    u_k, v_k = pf.fused_pair_reverse_wino(u, v, c_a, c_b, ops,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Block-fused chains: all n_flow/2 pairs in ONE kernel launch
# ---------------------------------------------------------------------------

def _xla_chain_reverse(bp, cfg, u, v, c_a, c_b):
    """Reference: the full block's pair-scan (all pairs, reversed)."""
    (u, v), _ = jax.lax.scan(
        fwn._pair_step_rev(cfg, c_a, c_b, None, None), (u, v),
        fwn._pair_params(bp), reverse=True)
    return u, v


@pytest.mark.parametrize("T,t_tile", [(192, 64), (200, 64), (192, 192)])
def test_chain_kernel_matches_xla(key, rng, T, t_tile):
    """3-pair direct chain (whole 6-flow block, one launch) == XLA pair
    scan, across tile boundaries, ragged tails (T=200 pads to 256: the
    inter-pair masking must re-zero the padded region), and single-tile."""
    from flowavenet_tpu.ops.pallas_flow import (fused_chain_reverse,
                                                stack_chain_operands)
    cfg = dataclasses.replace(CFG, n_flow=6)
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_chain_reverse(bp, cfg, u, v, c_a, c_b)
    pp = fwn._pair_params(bp)
    ops = stack_chain_operands([
        pair_reverse_operands(jax.tree.map(lambda l, _i=i: l[_i], pp),
                              dtype=jnp.float32)
        for i in range(3)])
    u_k, v_k = fused_chain_reverse(u, v, c_a, c_b, ops, n_pair=3,
                                   t_tile=t_tile, interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("T,wtt", [(432, 144), (336, 144), (288, 960)])
def test_wino_chain_matches_xla(key, rng, monkeypatch, T, wtt):
    """3-pair Winograd chain == XLA pair scan: multi-tile (432 = 3x144),
    ragged tail with padding (336 -> T_pad 432, exercising inter-pair
    re-masking of the pad), and single-tile."""
    from flowavenet_tpu.ops import pallas_flow as pf
    monkeypatch.setattr(pf, "WINO_T_TILE", wtt)
    cfg = dataclasses.replace(CFG, n_flow=6)
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_chain_reverse(bp, cfg, u, v, c_a, c_b)
    pp = fwn._pair_params(bp)
    ops = pf.stack_chain_operands([
        pf.pair_reverse_operands_wino(
            jax.tree.map(lambda l, _i=i: l[_i], pp), dtype=jnp.float32)
        for i in range(3)])
    u_k, v_k = pf.fused_chain_reverse_wino(u, v, c_a, c_b, ops, n_pair=3,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("T,nb,n_pair", [(336, 2, 1), (288, 4, 1),
                                         (336, 2, 3)])
def test_wino_packed_matches_xla(key, rng, monkeypatch, T, nb, n_pair):
    """Batch-packed Winograd kernel (nb items per plane row, matmul M =
    rows*nb) == XLA pair scan, incl. ragged tails (T=336 pads) and packing
    composed with the chain."""
    from flowavenet_tpu.ops import pallas_flow as pf
    monkeypatch.setattr(pf, "WINO_T_TILE", 144)
    cfg = dataclasses.replace(CFG, n_flow=2 * n_pair)
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    B = 2 * nb if nb > 1 else 4
    u = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(B, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(B, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_chain_reverse(bp, cfg, u, v, c_a, c_b)
    pp = fwn._pair_params(bp)
    ops = pf.stack_chain_operands([
        pf.pair_reverse_operands_wino(
            jax.tree.map(lambda l, _i=i: l[_i], pp), dtype=jnp.float32)
        for i in range(n_pair)])
    u_k, v_k = pf.fused_chain_reverse_wino(u, v, c_a, c_b, ops,
                                           n_pair=n_pair, nb=nb,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_model_routing_matches_xla(key, rng, monkeypatch):
    """Full tiny model with FWN_PACK=2 routing (packed cond tiles built in
    reverse(), packed kernel in block_reverse): matches the XLA path."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_PACK", 2)
    cfg_off = dataclasses.replace(CFG, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(4, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(4, 8192 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = np.asarray(reverse(params, cfg_off, z, mel))
    fast = np.asarray(reverse(params, cfg_on, z, mel))
    np.testing.assert_allclose(fast, base, rtol=5e-5, atol=5e-5)
    assert np.all(np.isfinite(fast))


def test_chain_model_routing_matches_xla(key, rng, monkeypatch):
    """Full tiny model with n_flow=4 (2 pairs/block): chained kernel path
    (interpret) == XLA path, covering the in-model cond-tile geometry."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CHAIN", True)
    cfg_off = dataclasses.replace(CFG, n_flow=4, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, n_flow=4, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(2, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 8192 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = np.asarray(reverse(params, cfg_off, z, mel))
    fast = np.asarray(reverse(params, cfg_on, z, mel))
    np.testing.assert_allclose(fast, base, rtol=5e-5, atol=5e-5)
    assert np.all(np.isfinite(fast))


@pytest.mark.parametrize("k,P", [(1, 6), (2, 6), (1, 12), (3, 12)])
def test_wino_cond_tiles_matches_composition(rng, k, P):
    """Direct-from-mel tile builder == de-interleave(squeeze_to_level)."""
    from flowavenet_tpu.ops import pallas_flow as pf
    from flowavenet_tpu.ops.squeeze import squeeze_to_level
    c = jnp.asarray(rng.randn(2, 96 << k, 5), jnp.float32)
    ck = squeeze_to_level(c, k)
    t_tile, n_t, T_pad = pf._wino_geometry(ck.shape[1], P)
    want_t, want_h = pf._tiles_and_halos_wino(ck, t_tile, n_t, T_pad, P,
                                              6 * P)
    got_t, got_h = pf.wino_cond_tiles(c, k, P)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))


def test_model_routing_matches_xla(key, rng, monkeypatch):
    """reverse() with use_pallas=True (kernel path, interpret on CPU) must
    match use_pallas=False bit-closely on the full tiny model."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    cfg_off = dataclasses.replace(CFG, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(2, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 8192 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = np.asarray(reverse(params, cfg_off, z, mel))
    fast = np.asarray(reverse(params, cfg_on, z, mel))
    np.testing.assert_allclose(fast, base, rtol=2e-5, atol=2e-5)
    assert np.all(np.isfinite(fast))


def test_routing_bounds_follow_runtime_int8_toggle(monkeypatch):
    """PAIR_KERNEL_INT8 is toggled at RUNTIME by tools/int8_quality_gate.py;
    the width bound and the direct-kernel tile must follow the live flag,
    not values frozen from FWN_INT8 at import — otherwise the gate's bf16
    baseline runs at the int8-swept tile (1536) and width (1280) that the
    bf16 sweep measured as losing/exceeding VMEM."""
    from flowavenet_tpu.ops import pallas_flow as pf
    monkeypatch.setattr(fwn, "PAIR_KERNEL_MAX_CC", None)  # env unset
    monkeypatch.setattr(pf, "DIRECT_T_TILE", None)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", True)
    assert fwn._pair_max_cc() == 1280
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    assert fwn._pair_max_cc() == 640
    assert pf.direct_t_tile(True) == 1536
    assert pf.direct_t_tile(False) == 1024
    # explicit override wins for both modes
    monkeypatch.setattr(fwn, "PAIR_KERNEL_MAX_CC", 96)
    assert fwn._pair_max_cc() == 96
    monkeypatch.setattr(pf, "DIRECT_T_TILE", 768)
    assert pf.direct_t_tile(True) == 768
    assert pf.direct_t_tile(False) == 768
    # the measured device-wedge guard stays tied to the int8 LAUNCH
    monkeypatch.setattr(pf, "DIRECT_T_TILE", 1792)
    assert pf.direct_t_tile(False) == 1792
    with pytest.raises(ValueError, match="1664"):
        pf.direct_t_tile(True)


def test_wino_cond_pretiling_reaches_kernel(key, rng, monkeypatch):
    """reverse() builds the wino plane tiles ONCE per block directly from
    the mel halves, and block_reverse must CONSUME them.  Regression guard
    for the round-3 cond-route rebinding that silently clobbered the
    pre-built tiles with squeeze_to_level copies (the numerics stayed
    right — block_reverse just re-tiled plain arrays — so only call
    accounting can catch the dead optimization)."""
    from flowavenet_tpu.ops import pallas_flow as pf
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    calls = {"tiles": 0, "sqz": 0}
    real_tiles = pf.wino_cond_tiles
    monkeypatch.setattr(
        pf, "wino_cond_tiles",
        lambda *a, **k: (calls.__setitem__("tiles", calls["tiles"] + 1),
                         real_tiles(*a, **k))[1])
    real_sqz = fwn.squeeze_to_level
    monkeypatch.setattr(
        fwn, "squeeze_to_level",
        lambda *a, **k: (calls.__setitem__("sqz", calls["sqz"] + 1),
                         real_sqz(*a, **k))[1])
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_on)
    z = jnp.asarray(rng.randn(2, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 8192 // cfg_on.hop_size,
                               cfg_on.num_mels), jnp.float32)
    wav = reverse(params, cfg_on, z, mel)
    assert np.all(np.isfinite(np.asarray(wav)))
    # one wino_cond_tiles per (block, half); squeeze_to_level only for the
    # initial x squeeze — zero per-block cond copies
    assert calls["tiles"] == 2 * cfg_on.n_block
    assert calls["sqz"] == 1


def test_routing_gates(key, monkeypatch):
    """Eligibility: causal / gin / odd layers fall back to XLA, CPU never
    routes unless the interpret escape hatch is set, and the variant is
    selected by conditioning width (wino -> direct -> hoisted)."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    on = dataclasses.replace(CFG, use_pallas=True)
    assert fwn._pair_kernel_mode(on, 160, has_g=False) is None  # cpu backend
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO4", True)
    assert fwn._pair_kernel_mode(on, 160, has_g=False) == "wino4"
    monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO4", False)
    assert fwn._pair_kernel_mode(on, 160, has_g=False) == "wino"
    assert fwn._pair_kernel_mode(on, 640, has_g=False) == "direct"
    monkeypatch.setattr(fwn, "PAIR_KERNEL_HOISTED", True)
    assert fwn._pair_kernel_mode(on, 10240, has_g=False) == "hoisted"
    monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO", False)
    assert fwn._pair_kernel_mode(on, 160, has_g=False) == "direct"
    monkeypatch.setattr(fwn, "PAIR_KERNEL_HOISTED", False)
    assert fwn._pair_kernel_mode(on, 10240, has_g=False) is None
    assert fwn._pair_kernel_mode(
        dataclasses.replace(CFG, use_pallas=False), 160, has_g=False) is None
    assert fwn._pair_kernel_mode(
        dataclasses.replace(on, causal=True), 160, False) is None
    assert fwn._pair_kernel_mode(on, 160, True) is None          # gin
    assert fwn._pair_kernel_mode(
        dataclasses.replace(on, n_layer=3), 160, False) is None


@pytest.mark.parametrize("T,t_tile", [(128, 128), (192, 64)])
def test_hoisted_pair_kernel_matches_xla(key, rng, T, t_tile):
    """Hoisted-conditioning kernel == XLA pair-scan: the cond matmul runs
    outside (fp32 accumulate) and the kernel consumes the planes."""
    from flowavenet_tpu.ops.pallas_flow import pair_reverse_operands_hoisted
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops, (w_e, w_o) = pair_reverse_operands_hoisted(pair, dtype=jnp.float32)
    ce = jnp.dot(c_a, w_e, preferred_element_type=jnp.float32)
    co = jnp.dot(c_b, w_o, preferred_element_type=jnp.float32)
    u_k, v_k = fused_pair_reverse(u, v, ce, co, ops, t_tile=t_tile,
                                  interpret=True, hoisted=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)


def test_hoisted_in_model_routing(key, rng, monkeypatch):
    """Force the hoisted variant for EVERY block of the tiny model (as deep
    blocks use it in production) and match the XLA path end to end."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_HOISTED", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_MAX_CC", 0)  # nothing 'direct'
    cfg_off = dataclasses.replace(CFG, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(2, 4096, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 4096 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = np.asarray(reverse(params, cfg_off, z, mel))
    fast = np.asarray(reverse(params, cfg_on, z, mel))
    np.testing.assert_allclose(fast, base, rtol=2e-5, atol=2e-5)
    assert np.all(np.isfinite(fast))


# ---------------------------------------------------------------------------
# FORWARD pair kernel (training / NLL eval)
# ---------------------------------------------------------------------------

def _xla_pair_forward(bp, cfg, u, v, c_a, c_b):
    (u, v), (lds, _) = jax.lax.scan(
        fwn._pair_step_fwd(cfg, c_a, c_b, None, None), (u, v),
        fwn._pair_params(bp))
    return u, v, jnp.sum(lds)


@pytest.mark.parametrize("T,t_tile", [(128, 128), (192, 64), (96, 32)])
def test_pair_forward_kernel_matches_xla(key, rng, T, t_tile):
    """Forward kernel == XLA pair-scan (outputs AND logdet) across tile
    boundaries and ragged final tiles."""
    from flowavenet_tpu.ops.pallas_flow import (fused_pair_forward,
                                                pair_forward_operands)
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    B = 2
    u = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(B, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(B, T, cfg.num_mels), jnp.float32)

    u_ref, v_ref, ld_ref = _xla_pair_forward(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_forward_operands(pair, dtype=jnp.float32)
    u_k, v_k, s = fused_pair_forward(u, v, c_a, c_b, ops, t_tile=t_tile,
                                     interpret=True)
    even = jax.tree.map(lambda l: l[0], pair)
    odd = jax.tree.map(lambda l: l[1], pair)
    ld_k = (fwn._an_logdet(even["actnorm"]) + fwn._an_logdet(odd["actnorm"])
            + s / (B * T * u.shape[-1]) / 2.0)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(ld_k), float(ld_ref), rtol=1e-5)


def test_pair_forward_fused_grads_match_xla(key, rng):
    """custom_vjp route: primal from the kernel, gradients from the XLA
    re-derivation — grads must equal jax.grad of the pure-XLA mirror."""
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 96
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))

    def loss_fused(pair, u, v, c_a):
        u2, v2, s = fwn._pair_fwd_fused(True, pair, u, v, c_a, c_b)
        return jnp.sum(u2) + 2.0 * jnp.sum(v2) + 0.1 * s

    def loss_ref(pair, u, v, c_a):
        u2, v2, s = fwn._pair_fwd_ref(pair, u, v, c_a, c_b)
        return jnp.sum(u2) + 2.0 * jnp.sum(v2) + 0.1 * s

    lf = loss_fused(pair, u, v, c_a)
    lr = loss_ref(pair, u, v, c_a)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(pair, u, v, c_a)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pair, u, v, c_a)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_fwd_kernel_model_loss_matches_xla(key, rng, monkeypatch):
    """Full tiny model: loss_fn with the forward kernel routed == pure XLA
    (value AND gradients)."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", False)
    import dataclasses as dc
    from flowavenet_tpu.models.flowavenet import loss_fn
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_FWD", True)
    cfg_off = dc.replace(CFG, use_pallas=False)
    cfg_on = dc.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    x = jnp.asarray(0.1 * rng.randn(2, 4096, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 4096 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base, _ = loss_fn(params, cfg_off, x, mel)
    fast, _ = loss_fn(params, cfg_on, x, mel)
    np.testing.assert_allclose(float(fast), float(base), rtol=2e-5)
    gb = jax.grad(lambda p: loss_fn(p, cfg_off, x, mel)[0])(params)
    gk = jax.grad(lambda p: loss_fn(p, cfg_on, x, mel)[0])(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fwd_kernel_refuses_logs_guards(key, rng, monkeypatch):
    """The fused forward pair kernel never materializes log_s, so its
    blocks would contribute hard zero to the logs_hinge/logs_l2 guard
    stats — loss_fn must refuse the combination loudly instead of
    training unguarded while metrics report a healthy 0."""
    import dataclasses as dc
    from flowavenet_tpu.models.flowavenet import loss_fn
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_FWD", True)
    cfg = dc.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg)
    x = jnp.asarray(0.1 * rng.randn(2, 4096, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 4096 // cfg.hop_size, cfg.num_mels),
                      jnp.float32)
    with pytest.raises(ValueError, match="FWN_FWD_KERNEL"):
        loss_fn(params, cfg, x, mel, logs_hinge=1.0)
    with pytest.raises(ValueError, match="FWN_FWD_KERNEL"):
        loss_fn(params, cfg, x, mel, logs_l2=1e-4)
    # guards off: the knob still works
    loss, _ = loss_fn(params, cfg, x, mel)
    assert np.isfinite(float(loss))


def test_hoisted_int8_pair_kernel_close_to_xla(key, rng):
    """Hoisted conditioning + int8 fg convs (deep-block FWN_HOISTED +
    FWN_INT8 route)."""
    from flowavenet_tpu.ops.pallas_flow import (
        pair_reverse_operands_hoisted_int8)
    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 192
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    u_ref, v_ref = _xla_pair_reverse(bp, cfg, u, v, c_a, c_b)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops, (w_e, w_o) = pair_reverse_operands_hoisted_int8(
        pair, dtype=jnp.float32)
    ce = jnp.dot(c_a, w_e, preferred_element_type=jnp.float32)
    co = jnp.dot(c_b, w_o, preferred_element_type=jnp.float32)
    u_k, v_k = fused_pair_reverse(u, v, ce, co, ops, t_tile=64,
                                  interpret=True, hoisted=True, int8=True)
    for got, want in ((u_k, u_ref), (v_k, v_ref)):
        got, want = np.asarray(got), np.asarray(want)
        assert np.all(np.isfinite(got))
        denom = max(1e-6, float(np.abs(want).max()))
        rel = float(np.abs(got - want).max()) / denom
        corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
        assert rel < 0.08 and corr > 0.998, (rel, corr)


def _corr_close(got, want, corr_min=0.998, rel_max=0.08):
    got, want = np.asarray(got), np.asarray(want)
    assert np.all(np.isfinite(got))
    denom = max(1e-6, float(np.abs(want).max()))
    rel = float(np.abs(got - want).max()) / denom
    corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
    assert rel < rel_max and corr > corr_min, (rel, corr)


def test_int8_model_routing_matches_xla(key, rng, monkeypatch):
    """Full tiny model with the int8 route (incl. int8 cond, the default
    under FWN_INT8): close to the XLA path on randomized params."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", True)
    cfg_off = dataclasses.replace(CFG, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(2, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 8192 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = reverse(params, cfg_off, z, mel)
    fast = reverse(params, cfg_on, z, mel)
    _corr_close(fast, base)


def test_deep_block_int8_cond_matches_xla(key, rng, monkeypatch):
    """Deep-block route (no kernel eligible -> XLA pair-scan) with the
    int8 conditioning matmuls (models/flowavenet.py block_reverse /
    modules.py _cond_fg int8 path): close to the fp32 XLA path."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_HOISTED", False)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_MAX_CC", 0)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO", False)
    cfg_off = dataclasses.replace(CFG, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(2, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 8192 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = reverse(params, cfg_off, z, mel)
    fast = reverse(params, cfg_on, z, mel)
    _corr_close(fast, base, corr_min=0.999, rel_max=0.05)


def test_hoisted_int8_model_routing_matches_xla(key, rng, monkeypatch):
    """Full tiny model forced onto the hoisted+int8 deep-block route
    (FWN_HOISTED + FWN_INT8)."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_HOISTED", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_MAX_CC", 0)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO", False)
    cfg_off = dataclasses.replace(CFG, use_pallas=False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_off)
    z = jnp.asarray(rng.randn(2, 8192, 1), jnp.float32)
    mel = jnp.asarray(rng.rand(2, 8192 // cfg_off.hop_size,
                               cfg_off.num_mels), jnp.float32)
    base = reverse(params, cfg_off, z, mel)
    fast = reverse(params, cfg_on, z, mel)
    _corr_close(fast, base)


@pytest.mark.parametrize("deep", [False, True])
def test_int8_route_batch_composition_invariant(key, rng, monkeypatch,
                                                deep):
    """Per-ROW conditioning scales (ops/conv.py quantize_act per_row):
    a row's audio must be bit-identical no matter what its batch
    companions contain — the serving determinism contract
    (serving/server.py).  A per-tensor amax would let one LOUD companion
    mel change every other row's int8 codes.  ``deep`` forces the XLA
    pair-scan route (int8 cond matmuls) instead of the fused kernels."""
    monkeypatch.setattr(fwn, "PAIR_KERNEL_CPU_INTERPRET", True)
    monkeypatch.setattr(fwn, "PAIR_KERNEL_INT8", True)
    if deep:
        monkeypatch.setattr(fwn, "PAIR_KERNEL_HOISTED", False)
        monkeypatch.setattr(fwn, "PAIR_KERNEL_MAX_CC", 0)
        monkeypatch.setattr(fwn, "PAIR_KERNEL_WINO", False)
    cfg_on = dataclasses.replace(CFG, use_pallas=True)
    params = _randomized(key, cfg_on)
    T = 8192
    z = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    mel_row = rng.rand(1, T // cfg_on.hop_size, cfg_on.num_mels)
    quiet = rng.rand(1, T // cfg_on.hop_size, cfg_on.num_mels)
    loud = 5.0 * quiet

    out_q = reverse(params, cfg_on, z,
                    jnp.asarray(np.concatenate([mel_row, quiet]),
                                jnp.float32))
    out_l = reverse(params, cfg_on, z,
                    jnp.asarray(np.concatenate([mel_row, loud]),
                                jnp.float32))
    np.testing.assert_array_equal(np.asarray(out_q[0]),
                                  np.asarray(out_l[0]))


def test_pair_kernel_flat_uv_layout(key, rng, monkeypatch):
    """FWN_FLAT_UV (flat t_tile*R_in u/v operands, dense layout) is
    bit-identical to the 4-D tile layout across tile boundaries and a
    ragged final tile."""
    import flowavenet_tpu.ops.pallas_flow as pf

    cfg = CFG
    params = _randomized(key, cfg)
    bp = params["blocks"][0]
    T = 192
    u = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    v = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c_a = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    c_b = jnp.asarray(rng.randn(2, T, cfg.num_mels), jnp.float32)
    pair = jax.tree.map(lambda l: l[0], fwn._pair_params(bp))
    ops = pair_reverse_operands(pair, dtype=jnp.float32)
    monkeypatch.setattr(pf, "FLAT_UV", False)
    u0, v0 = fused_pair_reverse(u, v, c_a, c_b, ops, t_tile=64,
                                interpret=True)
    monkeypatch.setattr(pf, "FLAT_UV", True)
    u1, v1 = fused_pair_reverse(u, v, c_a, c_b, ops, t_tile=64,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
