"""Config preset tests incl. the 8 kHz profile (hparams8000.py parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.config import (Config, get_config, lj22k, lj8k, lj8k_gin,
                                   tiny)


def test_lj22k_matches_reference_hparams():
    cfg = lj22k()
    a, m, d = cfg.audio, cfg.model, cfg.data
    assert (a.sample_rate, a.n_fft, a.hop_size, a.num_mels) == \
        (22050, 1024, 256, 80)
    assert (a.fmin, a.fmax) == (125.0, 7600.0)
    assert (m.n_block, m.n_flow, m.n_layer) == (8, 6, 2)
    assert m.affine and not m.causal
    assert m.upsample_scales == (16, 16) and m.hop_size == 256
    assert d.max_time_steps == 6400 and d.batch_size == 8
    assert cfg.train.temp == 0.7


def test_lj8k_matches_reference_hparams8000():
    cfg = lj8k()
    a, m, d = cfg.audio, cfg.model, cfg.data
    assert (a.sample_rate, a.n_fft, a.hop_size, a.fmax) == \
        (8000, 512, 96, 4000.0)
    assert m.n_block == 5
    assert m.upsample_scales == (8, 12) and m.hop_size == 96
    assert d.max_time_steps == 2320
    # hop divisible by squeeze factor => any mel length synthesizable
    assert m.hop_size % m.squeeze_factor == 0


def test_json_roundtrip():
    cfg = lj8k()
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_unknown_preset():
    with pytest.raises(KeyError, match="unknown preset"):
        get_config("nope")


def test_lj8k_gin_matches_reference_hparams():
    """Global-conditioning preset (reference hparams.py:39-40 with
    gin_channels enabled; BASELINE.json configs[2])."""
    cfg = lj8k_gin()
    assert cfg.model.gin_channels == 256 and cfg.model.n_speakers == 7
    # everything else inherits the 8 kHz profile
    assert cfg.audio.sample_rate == 8000 and cfg.model.n_block == 5
    assert get_config("lj8k_gin") == cfg


def test_lj8k_gin_forward_reverse_with_speakers(key):
    """The gin preset runs fwd/rev end to end with per-item speaker ids
    (filter size shrunk to keep the CPU test fast; geometry unchanged)."""
    from flowavenet_tpu.models.flowavenet import (forward, init_flowavenet,
                                                  reverse)
    cfg = dataclasses.replace(lj8k_gin().model, filter_size=16,
                              gin_channels=16)
    params = init_flowavenet(key, cfg)
    assert params["speaker_emb"].shape == (7, 16)
    rng = np.random.RandomState(0)
    frames = 4
    T = frames * cfg.hop_size
    x = jnp.asarray(rng.randn(2, T, 1), jnp.float32)
    c = jnp.asarray(rng.rand(2, frames, cfg.num_mels), jnp.float32)
    g = jnp.asarray([0, 6], jnp.int32)
    log_p, logdet = forward(params, cfg, x, c, g)
    assert np.isfinite(float(log_p)) and np.isfinite(float(logdet))
    wav = reverse(params, cfg, x, c, g)
    assert wav.shape == x.shape and np.all(np.isfinite(np.asarray(wav)))
    with pytest.raises(ValueError, match="gin_channels"):
        forward(params, cfg, x, c, None)


def test_lj8k_geometry_train_step(key):
    """One training step at the 8 kHz geometry ((8,12) upsample, n_block=5,
    hop 96) — catches squeeze/upsample misalignment the value checks miss."""
    from flowavenet_tpu.training.train_state import (create_state,
                                                     ddi_initialize,
                                                     make_train_step)
    base = lj8k()
    cfg = base.replace(
        model=dataclasses.replace(base.model, filter_size=16),
        data=dataclasses.replace(base.data, max_time_steps=960,
                                 batch_size=2))
    rng = np.random.RandomState(0)
    T = cfg.data.max_time_steps
    batch = {
        "audio": jnp.asarray(0.1 * rng.randn(2, T, 1), jnp.float32),
        "mel": jnp.asarray(rng.rand(2, T // cfg.audio.hop_size,
                                    cfg.model.num_mels), jnp.float32),
    }
    state = create_state(key, cfg)
    state = ddi_initialize(state, cfg, batch)
    state, metrics = jax.jit(make_train_step(cfg))(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_lj8k_model_forward_reverse(key):
    """The 8 kHz variant runs end to end on tiny shapes."""
    from flowavenet_tpu.models.flowavenet import (forward, init_flowavenet,
                                                  reverse)
    cfg = lj8k().model
    params = init_flowavenet(key, cfg)
    rng = np.random.RandomState(0)
    frames = 4
    T = frames * cfg.hop_size  # 384, divisible by 2**5
    x = jnp.asarray(rng.randn(1, T, 1), jnp.float32)
    c = jnp.asarray(rng.rand(1, frames, cfg.num_mels), jnp.float32)
    log_p, logdet = forward(params, cfg, x, c)
    assert np.isfinite(float(log_p))
    wav = reverse(params, cfg, x, c)
    assert wav.shape == x.shape
