"""Training stack tests: LR schedule parity, checkpoint roundtrip, loss
decreases, deterministic resume (SURVEY §4 items 3, 6, 7 partly).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.checkpoint.checkpoint import (latest_checkpoint,
                                                  restore_checkpoint,
                                                  save_checkpoint)
from flowavenet_tpu.config import (Config, DataConfig, ModelConfig,
                                   TrainConfig, tiny)
from flowavenet_tpu.training.optimizer import lr_schedule, make_optimizer
from flowavenet_tpu.training.train_state import (TrainState, create_state,
                                                 ddi_initialize,
                                                 make_eval_step,
                                                 make_train_step)

CFG = tiny()


def _batch(rng, cfg: Config, B=2):
    T = cfg.data.max_time_steps
    hop = cfg.audio.hop_size
    x = 0.2 * np.sin(np.linspace(0, 60, B * T)).reshape(B, T, 1)
    x = (x + 0.01 * rng.randn(B, T, 1)).astype(np.float32)
    c = rng.rand(B, T // hop, cfg.model.num_mels).astype(np.float32)
    return {"audio": x, "mel": c}


def test_lr_schedule_matches_reference():
    # train.py:17-20: 1e-3 | /2 @200k | /4 @400k | /6 @600k
    sched = lr_schedule(TrainConfig())
    for step, expected in [(0, 1e-3), (199_999, 1e-3), (200_000, 5e-4),
                           (399_999, 5e-4), (400_000, 2.5e-4),
                           (599_999, 2.5e-4), (600_000, 1e-3 / 6),
                           (1_999_999, 1e-3 / 6)]:
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_grad_clipping_applied(rng):
    opt = make_optimizer(TrainConfig())
    params = {"w": jnp.ones((4,))}
    big = {"w": jnp.full((4,), 1e3)}
    state = opt.init(params)
    updates, _ = opt.update(big, state, params)
    # after clip to norm 1, adam normalizes again; just check finiteness and
    # that the raw 1e3 didn't survive scaling
    assert np.all(np.abs(np.array(updates["w"])) < 1.0)


def test_checkpoint_roundtrip(tmp_path, key, rng):
    state = create_state(key, CFG)
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    path = save_checkpoint(str(tmp_path), 7, jax.device_get(state))
    assert latest_checkpoint(str(tmp_path)) == path
    template = create_state(jax.random.PRNGKey(99), CFG)
    restored, step = restore_checkpoint(path, template)
    assert step == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_prune_and_latest(tmp_path, key):
    state = {"w": jnp.ones((2,))}
    for s in [1, 2, 3, 4, 5, 6, 7]:
        save_checkpoint(str(tmp_path), s, state, keep=3)
    files = sorted(os.listdir(tmp_path))
    assert files == ["ckpt-5.npz", "ckpt-6.npz", "ckpt-7.npz"]
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt-7.npz")


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    save_checkpoint(str(tmp_path), 1, {"w": jnp.ones((2,))})
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_checkpoint(latest_checkpoint(str(tmp_path)),
                           {"w": jnp.ones((3,))})


def test_train_step_reduces_loss(key, rng):
    state = create_state(key, CFG)
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    train_step = jax.jit(make_train_step(CFG))
    losses = []
    for _ in range(8):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_nonfinite_step_skipped(key, rng):
    """A poisoned batch (NaN audio -> NaN loss/grads) must leave params
    and optimizer state untouched and be reported, not poison the run —
    the flagship divergence regression (docs/benchmarks.md, lj22k gate)."""
    state = create_state(key, CFG)
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    train_step = jax.jit(make_train_step(CFG))
    state, m = train_step(state, batch)          # healthy step
    assert float(m["skipped_nonfinite"]) == 0.0

    bad = dict(batch)
    bad["audio"] = batch["audio"].copy()
    bad["audio"][0, 0, 0] = np.nan
    before = jax.tree.map(np.asarray, state.params)
    state, m = train_step(state, bad)
    assert float(m["skipped_nonfinite"]) == 1.0
    after = jax.tree.map(np.asarray, state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert int(state.step) == 2                  # counter still advances

    state, m = train_step(state, batch)          # and training continues
    assert float(m["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m["loss"]))


def test_train_eval_consistency(key, rng):
    state = create_state(key, CFG)
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    eval_step = jax.jit(make_eval_step(CFG))
    aux = eval_step(state.params, batch)
    train_step = jax.jit(make_train_step(CFG))
    _, metrics = train_step(state, batch)
    # same params, same batch: eval loss == train loss pre-update
    np.testing.assert_allclose(float(aux["loss"]), float(metrics["loss"]),
                               rtol=1e-6)


def test_deterministic_resume(tmp_path, key, rng):
    """Train 4 steps; checkpoint at 2; resume from 2 and verify steps 3-4
    produce bit-identical params (SURVEY §5.3)."""
    from flowavenet_tpu.data.records import FwRecordWriter
    from flowavenet_tpu.data.dataset import CropDataset

    # real dataset so the data stream is part of the test
    p = tmp_path / "train.fwrec"
    r = np.random.RandomState(0)
    hop = CFG.audio.hop_size
    with FwRecordWriter(str(p)) as w:
        for i in range(3):
            frames = 40
            w.write(r.randn(frames * hop).astype(np.float32),
                    r.rand(frames, CFG.model.num_mels).astype(np.float32))
    ds = CropDataset(str(p), hop_size=hop,
                     max_time_steps=CFG.data.max_time_steps, batch_size=2,
                     seed=5)

    train_step = jax.jit(make_train_step(CFG))
    state = create_state(key, CFG)
    state = ddi_initialize(state, CFG, ds.batch_at(0))

    mid = None
    for step in range(4):
        if step == 2:
            mid = jax.device_get(state)
        state, _ = train_step(state, ds.batch_at(step))
    final_a = jax.device_get(state.params)

    # resume
    state_b = TrainState(jnp.asarray(2, jnp.int32), mid.params,
                         mid.opt_state)
    for step in range(2, 4):
        state_b, _ = train_step(state_b, ds.batch_at(step))
    final_b = jax.device_get(state_b.params)
    for a, b in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_b)):
        np.testing.assert_array_equal(a, b)


def test_resume_with_other_loader_fails_loudly(tmp_path, key):
    """The python and native loaders use different PRNGs; resuming a run
    with the other loader must raise unless explicitly allowed (the stream
    would silently change otherwise)."""
    pytest.importorskip("flowavenet_tpu.data.native_loader")
    from flowavenet_tpu.data.records import FwRecordWriter
    from flowavenet_tpu.training.train import train

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    r = np.random.RandomState(0)
    hop = CFG.audio.hop_size
    with FwRecordWriter(str(data_dir / "train.fwrec")) as w:
        for _ in range(2):
            w.write(r.randn(40 * hop).astype(np.float32),
                    r.rand(40, CFG.model.num_mels).astype(np.float32))

    logdir = str(tmp_path / "logs")
    kw = dict(train_steps=1, checkpoint_interval=1, summary_interval=10,
              eval_interval=10, probe_synthesis=False)
    try:
        train(CFG, str(data_dir), logdir, loader="python", **kw)
    except RuntimeError as e:  # native toolchain missing etc.
        pytest.skip(f"train smoke unavailable: {e}")
    with pytest.raises(ValueError, match="allow_loader_switch"):
        train(CFG, str(data_dir), logdir, loader="native", **kw)
    # explicit override proceeds (and re-checkpoints with the new loader)
    train(CFG, str(data_dir), logdir, loader="native",
          allow_loader_switch=True,
          train_steps=2, checkpoint_interval=1, summary_interval=10,
          eval_interval=10, probe_synthesis=False)


def test_checkpoint_survives_partial_tmp(tmp_path):
    """A crashed save (leftover .tmp) must not break restore-latest."""
    save_checkpoint(str(tmp_path), 3, {"w": jnp.ones((2,))})
    (tmp_path / "garbage.tmp").write_bytes(b"\x00" * 100)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt-3.npz")
    tree, step = restore_checkpoint(latest_checkpoint(str(tmp_path)),
                                    {"w": jnp.zeros((2,))})
    assert step == 3 and float(np.asarray(tree["w"]).sum()) == 2.0


def test_bf16_train_step(key, rng):
    """bf16-compute training must compile and step (regression: jax 0.9's
    conv transpose rule rejects preferred_element_type mixing)."""
    import dataclasses
    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, compute_dtype="bfloat16"))
    state = create_state(key, cfg)
    batch = _batch(rng, cfg)
    state = ddi_initialize(state, cfg, batch)
    step = jax.jit(make_train_step(cfg))
    for _ in range(2):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # params stay fp32
    assert all(l.dtype == jnp.float32 or l.dtype == jnp.int32
               for l in jax.tree.leaves(state.params))


def test_remat_train_step_matches(key, rng):
    """remat must not change the loss or gradients (only memory/compute)."""
    import dataclasses
    cfg_n = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, remat=False))
    cfg_r = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, remat=True))
    batch = _batch(rng, CFG)
    state = create_state(key, cfg_n)
    state = ddi_initialize(state, cfg_n, batch)

    _, m_a = jax.jit(make_train_step(cfg_n))(state, batch)
    _, m_b = jax.jit(make_train_step(cfg_r))(state, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_a["grad_global_norm"]),
                               float(m_b["grad_global_norm"]), rtol=1e-4)


def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    """Preemption (SURVEY §5.3): SIGTERM mid-run must finish the in-flight
    step, write a checkpoint, and exit 0 — and the checkpoint must be
    resumable.  Run in a subprocess so the signal exercises the real
    handler installation in train()."""
    import signal
    import subprocess
    import sys
    import time as _time

    from flowavenet_tpu.checkpoint.checkpoint import latest_checkpoint
    from flowavenet_tpu.data.records import FwRecordWriter
    from flowavenet_tpu.training.train import train

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    r = np.random.RandomState(0)
    hop = CFG.audio.hop_size
    with FwRecordWriter(str(data_dir / "train.fwrec")) as w:
        for _ in range(2):
            w.write(r.randn(40 * hop).astype(np.float32),
                    r.rand(40, CFG.model.num_mels).astype(np.float32))
    logdir = tmp_path / "logs"

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from flowavenet_tpu.config import tiny
from flowavenet_tpu.training.train import train
train(tiny(), {str(data_dir)!r}, {str(logdir)!r}, train_steps=100000,
      checkpoint_interval=10**6, summary_interval=1, eval_interval=10**6,
      probe_synthesis=False)
"""
    p = subprocess.Popen([sys.executable, "-c", script],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    # wait for >=2 completed steps (summary_interval=1 -> one JSONL row
    # per step), then preempt
    metrics = logdir / "train" / "metrics.jsonl"
    deadline = _time.time() + 180
    try:
        while _time.time() < deadline:
            if metrics.exists() and len(metrics.read_text().splitlines()) >= 2:
                break
            if p.poll() is not None:
                break
            _time.sleep(0.25)
        else:
            raise AssertionError("training subprocess made no progress")
        assert p.poll() is None, f"training died early:\n{p.stdout.read()}"
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, f"non-zero exit after SIGTERM:\n{out}"
    assert "SIGTERM: checkpointed step" in out

    save_dir = str(logdir / "pretrained")
    ckpt = latest_checkpoint(save_dir)
    assert ckpt is not None, "preemption wrote no checkpoint"
    import re
    step = int(re.search(r"(\d+)", os.path.basename(ckpt)).group(1))
    assert step >= 2  # only the preemption path could have written it

    # the checkpoint resumes: two more steps in-process
    train(CFG, str(data_dir), str(logdir), train_steps=step + 2,
          checkpoint_interval=step + 2, summary_interval=10**6,
          eval_interval=10**6, probe_synthesis=False)
    assert latest_checkpoint(save_dir) != ckpt


def _with_const_log_s(state, value: float):
    """Doctor every coupling's zero conv so log_s == value EVERYWHERE:
    weights stay zero (output independent of input), the bias's log_s
    half is set to value.  Makes max|log_s| and mean(log_s^2) exact."""
    params = jax.device_get(state.params)
    for bp in params["blocks"]:
        b = np.array(bp["flows"]["coupling"]["zero"]["b"])  # [n_flow, out]
        b[:, : b.shape[1] // 2] = value
        bp["flows"]["coupling"]["zero"]["b"] = jnp.asarray(b)
    return state._replace(params=params)


def test_divergence_metrics_present_and_exact(key, rng):
    """VERDICT r3 item 7: max|log_s|, per-block logdet, param norm, and
    ActNorm scale norms must come out of every train step by default."""
    state = create_state(key, CFG)
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    train_step = jax.jit(make_train_step(CFG))
    _, m = train_step(state, batch)
    for k in ("max_log_s", "logs_mean_sq", "param_global_norm",
              "actnorm_max_logs3", "logdet_block0", "logdet_block1"):
        assert k in m, f"missing metric {k}"
        assert np.isfinite(float(m[k])), k
    # per-block logdets decompose the total
    total = sum(float(m[f"logdet_block{i}"])
                for i in range(CFG.model.n_block))
    np.testing.assert_allclose(total, float(m["logdet"]), rtol=1e-5)
    # fresh init: zero convs make every log_s exactly 0
    assert float(m["max_log_s"]) == 0.0
    assert float(m["logs_mean_sq"]) == 0.0

    # doctored constant log_s = 0.3: both stats are exact closed forms
    state2 = _with_const_log_s(state, 0.3)
    _, m2 = train_step(state2, batch)
    np.testing.assert_allclose(float(m2["max_log_s"]), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(m2["logs_mean_sq"]), 0.09, rtol=1e-6)


def test_logs_l2_regularizer(key, rng):
    """TrainConfig.logs_l2 adds logs_l2 * mean(log_s^2) to the optimized
    loss (metrics keep 'loss' = pure NLL) and its gradient actually pulls
    log_s toward zero."""
    import dataclasses

    cfg = CFG.replace(train=dataclasses.replace(CFG.train, logs_l2=2.0))
    state = create_state(key, cfg)
    batch = _batch(rng, cfg)
    state = ddi_initialize(state, cfg, batch)
    state = _with_const_log_s(state, 0.3)

    step_plain = jax.jit(make_train_step(CFG))
    step_reg = jax.jit(make_train_step(cfg))
    _, m0 = step_plain(state, batch)
    s1, m1 = step_reg(state, batch)
    # same params/batch: NLL identical, penalty = 2.0 * 0.09
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["logs_penalty"]), 0.18, rtol=1e-6)

    # gradient flows THROUGH the penalty: vs the plain loss, the
    # regularized gradient must grow exactly on the log_s bias half
    # (pushing the positive 0.3 toward 0) and stay identical on the t
    # half, which the penalty never touches
    from flowavenet_tpu.models.flowavenet import loss_fn

    def g_of(logs_l2):
        grads = jax.grad(
            lambda p: loss_fn(p, cfg.model, batch["audio"], batch["mel"],
                              None, logs_l2=logs_l2)[0])(state.params)
        b = np.asarray(grads["blocks"][0]["flows"]["coupling"]["zero"]["b"])
        return b[:, : b.shape[1] // 2], b[:, b.shape[1] // 2:]

    (ls_plain, t_plain), (ls_reg, t_reg) = g_of(0.0), g_of(2.0)
    assert np.all(ls_reg > ls_plain)
    np.testing.assert_allclose(t_reg, t_plain, rtol=1e-6)


def test_logs_hinge_regularizer(key, rng):
    """TrainConfig.logs_hinge (default ON) is EXACTLY ZERO in the healthy
    regime and, past LOGS_HINGE_MARGIN, adds w * sum-over-couplings of
    mean(relu(|log_s|-margin)^2)/2 — the logdet-normalized closed form.
    Chosen after logs_l2=0.1 failed a 50k flagship run (the L2 pressures
    the mean while the max runs away)."""
    from flowavenet_tpu.models.flowavenet import LOGS_HINGE_MARGIN, loss_fn

    state = create_state(key, CFG)  # CFG default: logs_hinge=1.0
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    train_step = jax.jit(make_train_step(CFG))

    # healthy |log_s| (0.3 << margin): hinge contributes nothing — the
    # optimized total equals the pure NLL bit-for-bit
    state_ok = _with_const_log_s(state, 0.3)
    _, m_ok = train_step(state_ok, batch)
    assert float(m_ok["logs_hinge"]) == 0.0
    assert float(m_ok["logs_penalty"]) == 0.0

    # runaway |log_s| = margin + 2: per coupling mean(excess^2)/2 = 2.0,
    # times n_block*n_flow couplings, times the default weight 1.0
    val = float(LOGS_HINGE_MARGIN) + 2.0
    state_bad = _with_const_log_s(state, val)
    _, m_bad = train_step(state_bad, batch)
    n_couplings = CFG.model.n_block * CFG.model.n_flow
    np.testing.assert_allclose(float(m_bad["logs_hinge"]),
                               n_couplings * 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(m_bad["logs_penalty"]),
                               n_couplings * 2.0, rtol=1e-5)

    # the gradient actually pushes the runaway log_s back down: vs the
    # unpenalized loss, the log_s bias-half gradient must grow, the t
    # half stay identical
    def g_of(w):
        grads = jax.grad(
            lambda p: loss_fn(p, CFG.model, batch["audio"], batch["mel"],
                              None, logs_hinge=w)[0])(state_bad.params)
        b = np.asarray(grads["blocks"][0]["flows"]["coupling"]["zero"]["b"])
        return b[:, : b.shape[1] // 2], b[:, b.shape[1] // 2:]

    (ls_plain, t_plain), (ls_reg, t_reg) = g_of(0.0), g_of(1.0)
    assert np.all(ls_reg > ls_plain)
    np.testing.assert_allclose(t_reg, t_plain, rtol=1e-6)


def test_actnorm_hinge_guard(key, rng):
    """TrainConfig.actnorm_hinge (default ON): zero below the margin —
    the train step is bit-identical to an unguarded one — and past it
    adds w * sum(relu(|3*logs|-margin)^2)/C per block, whose gradient
    pulls the runaway ActNorm scale back down.  Motivated by the round-4
    50k run's monotone actnorm_max_logs3 climb (docs/runs/)."""
    import dataclasses

    from flowavenet_tpu.models.flowavenet import LOGS_HINGE_MARGIN

    state = create_state(key, CFG)  # CFG default: actnorm_hinge=1.0
    batch = _batch(rng, CFG)
    state = ddi_initialize(state, CFG, batch)
    step_on = jax.jit(make_train_step(CFG))
    cfg_off = CFG.replace(train=dataclasses.replace(CFG.train,
                                                    actnorm_hinge=0.0))
    step_off = jax.jit(make_train_step(cfg_off))

    # healthy regime (DDI scales are small): penalty exactly zero and the
    # updated params match the unguarded step bit-for-bit
    s_on, m_on = step_on(state, batch)
    s_off, _ = step_off(state, batch)
    assert float(m_on["actnorm_hinge"]) == 0.0
    for a, b in zip(jax.tree.leaves(s_on.params),
                    jax.tree.leaves(s_off.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # runaway scales: |3*logs| = margin + 2 on every channel -> per block
    # sum(4)/C = 4*n_flow; gradient on logs grows vs the unguarded step
    params = jax.device_get(state.params)
    val = (float(LOGS_HINGE_MARGIN) + 2.0) / 3.0
    for bp in params["blocks"]:
        bp["flows"]["actnorm"]["logs"] = jnp.full_like(
            bp["flows"]["actnorm"]["logs"], val)
    state_bad = state._replace(params=params)
    _, m_bad = step_on(state_bad, batch)
    expect = 4.0 * CFG.model.n_flow * CFG.model.n_block
    np.testing.assert_allclose(float(m_bad["actnorm_hinge"]), expect,
                               rtol=1e-5)

    from flowavenet_tpu.training.train_state import actnorm_hinge_penalty
    g_pen = jax.grad(actnorm_hinge_penalty)(state_bad.params)
    g_logs = np.asarray(g_pen["blocks"][0]["flows"]["actnorm"]["logs"])
    assert np.all(g_logs > 0)  # pushes positive runaway logs DOWN
