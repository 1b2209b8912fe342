"""Pair-level fwd+bwd microbenchmark: fused training kernel vs XLA.

Measures value_and_grad through one block's chain of flow pairs at
TRAINING geometry (batch x crop from the flagship config), comparing:

  * XLA:    jax.checkpoint'd pair steps (the production scan path's
            math and remat policy, python-unrolled like the kernel
            branch so the comparison isolates the kernel),
  * kernel: _pair_train_fused (ops/pallas_flow_train.py) — fused
            forward with stats + single fused Mosaic backward.

Per-block geometry at lj22k, batch B, crop T0=6400: block b has
T = T0 / 2^(b+1), R_in = 2^b, Cc = 80 * 2^b.  The graphs here are
small (one block), so remote compiles take minutes, not the ~30 min of
the full 8-block train step — use this to decide which FWN_TRAIN_MAX_CC
deserves a full-step measurement (tools/bench_train.py with
FWN_TRAIN_KERNEL=1).

Env knobs: BENCH_BATCH (128) | BENCH_BLOCKS (0,1,2,3) | BENCH_ITERS (5)
| BENCH_PAIRS (3 — n_flow/2); kernel tile sizes via
  FWN_TRAIN_FWD_TT / FWN_TRAIN_BWD_TT
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import flowavenet_tpu.models.flowavenet as fwn
    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.ops import pallas_flow as pf

    B = int(os.environ.get("BENCH_BATCH", "128"))
    blocks = [int(b) for b in
              os.environ.get("BENCH_BLOCKS", "0,1,2,3").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    n_pairs = int(os.environ.get("BENCH_PAIRS", "3"))
    cfg = get_config("lj22k").model
    T0 = 6400
    dt = jnp.bfloat16

    # full-size params once; reuse each block's first pair
    params = fwn.init_flowavenet(jax.random.PRNGKey(0), cfg)
    results = {}
    for b in blocks:
        T = T0 // (2 ** (b + 1))
        r_in = 2 ** b
        cc = cfg.num_mels * (2 ** b)
        pairs = fwn._pair_params(params["blocks"][b])
        pair0 = jax.tree.map(lambda l: l[0], pairs)
        rng = np.random.RandomState(b)
        u = jnp.asarray(0.3 * rng.randn(B, T, r_in), dt)
        v = jnp.asarray(0.3 * rng.randn(B, T, r_in), dt)
        ca = jnp.asarray(rng.rand(B, T, cc), dt)
        cb = jnp.asarray(rng.rand(B, T, cc), dt)

        def loss_xla(pair, u, v, ca, cb):
            total = jnp.asarray(0.0, jnp.float32)
            step = jax.checkpoint(
                functools.partial(fwn._pair_fwd_ref),
                prevent_cse=False)
            for _ in range(n_pairs):
                u, v, raw = step(pair, u, v, ca, cb)
                total += raw
            return (total / (B * T * r_in) / 2.0
                    + jnp.sum(u.astype(jnp.float32) ** 2)
                    + jnp.sum(v.astype(jnp.float32) ** 2))

        def loss_ker(pair, u, v, ca, cb):
            total = jnp.asarray(0.0, jnp.float32)
            ops = pf.pair_forward_operands(pair, dt)
            for _ in range(n_pairs):
                u, v, raw, mx, sq, hq = fwn._pair_train_fused(
                    False, ops, u, v, ca, cb)
                total += raw + 0.0 * (sq + hq)
            return (total / (B * T * r_in) / 2.0
                    + jnp.sum(u.astype(jnp.float32) ** 2)
                    + jnp.sum(v.astype(jnp.float32) ** 2))

        def bench(name, fn):
            vg = jax.value_and_grad(fn)

            def fenced(pair, u, v, ca, cb):
                # fold every grad leaf into one scalar: its readback is
                # the execution fence (block_until_ready is unreliable on
                # the axon platform — see bench.py's measurement notes)
                val, grads = vg(pair, u, v, ca, cb)
                gs = sum(jnp.sum(l.astype(jnp.float32))
                         for l in jax.tree.leaves(grads))
                return val, gs

            g = jax.jit(fenced)
            t0 = time.time()
            val, gs = g(pair0, u, v, ca, cb)
            float(gs)
            compile_s = time.time() - t0
            times = []
            for _ in range(iters):
                t0 = time.time()
                val, gs = g(pair0, u, v, ca, cb)
                float(gs)
                times.append(time.time() - t0)
            best = min(times) * 1e3
            print(f"# block {b} ({name}): {best:.1f} ms "
                  f"(compile {compile_s:.0f}s, loss {float(val):.3f})",
                  file=sys.stderr)
            return best, float(val)

        ms_x, v_x = bench("xla+remat", loss_xla)
        ms_k, v_k = bench("fused-kernel", loss_ker)
        results[f"block{b}"] = {
            "xla_ms": round(ms_x, 1), "kernel_ms": round(ms_k, 1),
            "speedup": round(ms_x / ms_k, 3),
            "loss_rel": abs(v_x - v_k) / max(abs(v_x), 1e-9),
        }

    print(json.dumps({"metric": "train_pair_fwdbwd",
                      "batch": B, "pairs": n_pairs, **results}))


if __name__ == "__main__":
    main()
