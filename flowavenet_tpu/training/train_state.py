"""Train state + jitted SPMD train/eval steps.

The single Adam apply over psum-reduced grads replaces the reference's
tower-gradient averaging and consolidation device (train.py:35-83,
utils.py:34-60): with the batch sharded over the 'data' mesh axis and
params replicated, GSPMD lowers the gradient reduction to an ICI psum.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.flowavenet import (LOGS_HINGE_MARGIN, ddi, init_flowavenet,
                                 loss_fn)
from .optimizer import lr_schedule, make_optimizer


def actnorm_hinge_penalty(params) -> jax.Array:
    """Dead-zone hinge on the ActNorm scales: sum over blocks of
    sum(relu(|3*logs| - LOGS_HINGE_MARGIN)^2) / C_level, fp32.

    Parameter-space twin of the coupling logs_hinge (flowavenet.py
    _log_s_stats).  The per-channel normalization mirrors the ActNorm
    logdet (each channel holds B*T/C elements, so its logdet weight is
    3/C): with weight w the runaway mode stalls at |3*logs| =
    margin + 1/(2w), and below the margin the penalty — and therefore
    the whole train step — is bit-identical to the unguarded run."""
    pen = jnp.asarray(0.0, jnp.float32)
    for bp in params["blocks"]:
        logs3 = bp["flows"]["actnorm"]["logs"].astype(jnp.float32) * 3.0
        excess = jnp.maximum(jnp.abs(logs3) - LOGS_HINGE_MARGIN, 0.0)
        pen = pen + jnp.sum(excess * excess) / logs3.shape[-1]
    return pen


class TrainState(NamedTuple):
    step: jax.Array            # int32 scalar
    params: Any
    opt_state: Any


def create_state(key: jax.Array, cfg: Config) -> TrainState:
    params = init_flowavenet(key, cfg.model)
    opt = make_optimizer(cfg.train)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      opt_state=opt.init(params))


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" \
        else jnp.float32


def make_train_step(cfg: Config):
    """Returns train_step(state, batch) -> (state, metrics); jit-able and
    shardable (donate state for in-place buffer reuse)."""
    opt = make_optimizer(cfg.train)
    schedule = lr_schedule(cfg.train)
    dt = _compute_dtype(cfg)

    def train_step(state: TrainState, batch: dict):
        g = batch.get("speaker") if cfg.model.gin_channels > 0 else None

        def loss_of(p):
            total, aux = loss_fn(p, cfg.model, batch["audio"], batch["mel"],
                                 g, compute_dtype=dt,
                                 logs_l2=cfg.train.logs_l2,
                                 logs_hinge=cfg.train.logs_hinge)
            if cfg.train.actnorm_hinge > 0.0:
                pen = actnorm_hinge_penalty(p)
                aux["actnorm_hinge"] = pen
                total = total + cfg.train.actnorm_hinge * pen
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # Divergence watch (VERDICT r3): the flagship NaN's precursors —
        # coupling log_s growth (in aux via loss_fn) and ActNorm scale
        # growth — must be readable off the JSONL, not reconstructed
        # post-mortem.  Both reductions are over parameters (tiny next to
        # the grads), so the cost is noise.
        an_max = jnp.asarray(0.0, jnp.float32)
        for bp in state.params["blocks"]:
            an_max = jnp.maximum(an_max, jnp.max(jnp.abs(
                bp["flows"]["actnorm"]["logs"].astype(jnp.float32) * 3.0)))
        metrics = {**aux, "grad_global_norm": grad_norm,
                   "param_global_norm": optax.global_norm(state.params),
                   "actnorm_max_logs3": an_max,
                   "learning_rate": schedule(state.step)}
        if cfg.train.skip_nonfinite_updates:
            # one divergent step must not poison the params: pass the old
            # state through unchanged when the loss or any grad is
            # non-finite (grad_norm is the global reduction, so a single
            # NaN/inf leaf trips it).  jnp.where keeps the step fully
            # compiled — no host round-trip, no lax.cond branch overhead.
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                params, state.params)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old)
                if isinstance(new, jax.Array) else new,
                opt_state, state.opt_state)
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def make_eval_step(cfg: Config):
    dt = _compute_dtype(cfg)

    def eval_step(params, batch: dict):
        g = batch.get("speaker") if cfg.model.gin_channels > 0 else None
        _, aux = loss_fn(params, cfg.model, batch["audio"], batch["mel"], g,
                         compute_dtype=dt)
        return aux

    return eval_step


def ddi_initialize(state: TrainState, cfg: Config, batch: dict) -> TrainState:
    """Data-dependent ActNorm init from the first batch, then the usual
    first optimizer step runs on the updated params — semantics of the
    reference's init run (train.py:220-230)."""
    g = batch.get("speaker") if cfg.model.gin_channels > 0 else None
    new_params = ddi(state.params, cfg.model, batch["audio"], batch["mel"],
                     g, compute_dtype=jnp.float32)
    return state._replace(params=new_params)
