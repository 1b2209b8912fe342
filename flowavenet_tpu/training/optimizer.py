"""Optimizer: Adam + piecewise-constant LR + global-norm clipping.

Reference semantics (train.py:15-32): lr = 1e-3, /2 at 200k, /4 at 400k,
/6 at 600k steps; global-norm clip at 1.0; TF AdamOptimizer defaults
(b1=.9, b2=.999, eps=1e-8 applied outside the sqrt — same as optax.adam).

No loss scaling: bf16 compute with fp32 params/optimizer replaces the
reference's fp16 static-scale machinery (utils.py:3-31, train.py:64,77).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..config import TrainConfig


def lr_schedule(cfg: TrainConfig):
    boundaries = cfg.lr_boundaries

    def schedule(step):
        lr = jnp.asarray(cfg.learning_rate, jnp.float32)
        for boundary, divisor in boundaries:
            lr = jnp.where(step < boundary, lr,
                           cfg.learning_rate / divisor)
        return lr

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2,
                            eps=cfg.adam_eps),
        optax.scale_by_learning_rate(lr_schedule(cfg)),
    )
