"""Distributed tests on the 8-device virtual CPU mesh (SURVEY §4 item 6):
sharded train step == single-device step on the same global batch; TP mesh
compiles and matches DP numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flowavenet_tpu.config import Config, MeshConfig, tiny
from flowavenet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          param_sharding)
from flowavenet_tpu.training.train_state import (create_state,
                                                 ddi_initialize,
                                                 make_train_step)
from flowavenet_tpu.training.train import state_sharding

CFG = tiny()


def _batch(rng, cfg, B):
    T = cfg.data.max_time_steps
    hop = cfg.audio.hop_size
    return {
        "audio": (0.1 * rng.randn(B, T, 1)).astype(np.float32),
        "mel": rng.rand(B, T // hop, cfg.model.num_mels).astype(np.float32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _run_steps(cfg, state, batch, mesh=None, mesh_cfg=None, n=2):
    train_step = make_train_step(cfg)
    if mesh is None:
        step_fn = jax.jit(train_step)
    else:
        st_sh = state_sharding(state, mesh, mesh_cfg)
        b_sh = batch_sharding(mesh, mesh_cfg)
        state = jax.device_put(state, st_sh)
        batch = {k: jax.device_put(v, b_sh[k]) for k, v in batch.items()}
        step_fn = jax.jit(train_step, in_shardings=(st_sh, b_sh),
                          out_shardings=(st_sh, None))
    metrics = None
    for _ in range(n):
        state, metrics = step_fn(state, batch)
    return jax.device_get(state), metrics


def _grads(cfg, params, batch, mesh=None, mesh_cfg=None):
    from flowavenet_tpu.models.flowavenet import loss_fn

    def gfn(p, b):
        return jax.grad(
            lambda p: loss_fn(p, cfg.model, b["audio"], b["mel"])[0])(p)

    if mesh is None:
        return jax.device_get(jax.jit(gfn)(params, batch))
    p_sh = param_sharding(params, mesh, mesh_cfg)
    b_sh = batch_sharding(mesh, mesh_cfg)
    params = jax.device_put(params, p_sh)
    batch = {k: jax.device_put(v, b_sh[k]) for k, v in batch.items()}
    out = jax.jit(gfn, in_shardings=(p_sh, b_sh), out_shardings=p_sh)(
        params, batch)
    return jax.device_get(out)


def test_dp_grads_match_single_device(key, rng):
    """psum-reduced sharded grads == single-device grads on the same global
    batch.  (Comparing post-Adam params instead would amplify 1e-7 reduction
    noise to lr-scale differences on near-zero-gradient leaves.)"""
    batch = _batch(rng, CFG, B=8)
    state0 = create_state(key, CFG)
    state0 = ddi_initialize(state0, CFG, batch)

    ref = _grads(CFG, state0.params, batch)
    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    mesh = make_mesh(mesh_cfg)
    dp = _grads(CFG, state0.params, batch, mesh, mesh_cfg)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref)[0],
            jax.tree_util.tree_flatten_with_path(dp)[0]):
        atol = max(5e-7, 5e-5 * float(np.abs(a).max()))
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=atol,
            err_msg=jax.tree_util.keystr(pa))


def test_dp_train_step_runs_sharded(key, rng):
    batch = _batch(rng, CFG, B=8)
    state0 = create_state(key, CFG)
    state0 = ddi_initialize(state0, CFG, batch)
    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    mesh = make_mesh(mesh_cfg)
    state, metrics = _run_steps(CFG, state0, batch, mesh, mesh_cfg, n=2)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_dp_tp_mesh_compiles_and_matches(key, rng):
    """2-D (data=4, model=2) mesh: grads match single-device and the full
    train step compiles and runs."""
    batch = _batch(rng, CFG, B=4)
    state0 = create_state(key, CFG)
    state0 = ddi_initialize(state0, CFG, batch)

    ref = _grads(CFG, state0.params, batch)
    mesh_cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh = make_mesh(mesh_cfg)
    tp = _grads(CFG, state0.params, batch, mesh, mesh_cfg)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref)[0],
            jax.tree_util.tree_flatten_with_path(tp)[0]):
        atol = max(5e-7, 5e-5 * float(np.abs(a).max()))
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=atol,
            err_msg=jax.tree_util.keystr(pa))
    # and the full sharded train step runs on the 2-D mesh
    state, metrics = _run_steps(CFG, state0, batch, mesh, mesh_cfg, n=1)
    assert np.isfinite(float(metrics["loss"]))


def test_tp_shards_large_cond_convs(key):
    """The TP rule must actually shard something once Cin >= threshold."""
    from flowavenet_tpu.config import ModelConfig
    from flowavenet_tpu.models.flowavenet import init_flowavenet
    import flowavenet_tpu.parallel.mesh as mesh_mod

    mesh_cfg = MeshConfig(data_parallel=4, model_parallel=2)
    mesh = make_mesh(mesh_cfg)
    # lower the threshold so the tiny model triggers the rule
    old = mesh_mod.TP_MIN_CIN
    mesh_mod.TP_MIN_CIN = 32
    try:
        params = init_flowavenet(key, CFG.model)
        sh = param_sharding(params, mesh, mesh_cfg)
        specs = [s.spec for s in jax.tree.leaves(sh)]
        assert any(spec == P(None, None, "model", None) for spec in specs)
    finally:
        mesh_mod.TP_MIN_CIN = old


def test_batch_sharding_layout(key, rng):
    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    mesh = make_mesh(mesh_cfg)
    b = _batch(rng, CFG, B=8)
    sh = batch_sharding(mesh, mesh_cfg)
    audio = jax.device_put(b["audio"], sh["audio"])
    # one batch element per device
    assert len(audio.addressable_shards) == 8
    assert audio.addressable_shards[0].data.shape[0] == 1


def test_sharded_reverse_matches_single_device(key, rng):
    """Batch-parallel synthesis over the data mesh (serving scale-out):
    sharded reverse == single-device reverse."""
    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse

    cfg = CFG.model
    params = init_flowavenet(key, cfg)
    B, frames = 8, 4
    T = frames * cfg.hop_size
    z = jnp.asarray(rng.randn(B, T, 1), np.float32)
    c = jnp.asarray(rng.rand(B, frames, cfg.num_mels), np.float32)

    ref = jax.jit(lambda p, z, c: reverse(p, cfg, z, c))(params, z, c)

    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    mesh = make_mesh(mesh_cfg)
    p_sh = param_sharding(params, mesh, mesh_cfg)
    d_sh = NamedSharding(mesh, P("data"))
    params_s = jax.device_put(params, p_sh)
    z_s, c_s = jax.device_put(z, d_sh), jax.device_put(c, d_sh)
    out = jax.jit(lambda p, z, c: reverse(p, cfg, z, c),
                  in_shardings=(p_sh, d_sh, d_sh),
                  out_shardings=d_sh)(params_s, z_s, c_s)
    assert len(out.addressable_shards) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
