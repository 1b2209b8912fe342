"""Config preset tests incl. the 8 kHz profile (hparams8000.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowavenet_tpu.config import Config, get_config, lj22k, lj8k, tiny


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
