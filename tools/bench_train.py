"""Training-throughput benchmark (companion to bench.py's synthesis metric).

Times the full jitted train step (forward + grads + clip + Adam) with
donated state and device-generated batches; prints one JSON line.

Env knobs: BENCH_BATCH (8) | BENCH_CONFIG (lj22k) | BENCH_ITERS (3)
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import json
import time


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.training.train_state import (create_state,
                                                     make_train_step)

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    T = cfg.data.max_time_steps
    frames = T // cfg.audio.hop_size
    sr = cfg.audio.sample_rate

    state = jax.jit(lambda k: create_state(k, cfg))(jax.random.PRNGKey(0))
    float(jax.tree.leaves(state.params)[0].sum())

    @jax.jit
    def dev_batch(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return {
            "audio": jax.random.normal(k1, (batch, T, 1), jnp.float32) * 0.1,
            "mel": jax.random.uniform(k2, (batch, frames,
                                           cfg.model.num_mels), jnp.float32),
        }

    step_fn = jax.jit(make_train_step(cfg), donate_argnums=0)
    state, m = step_fn(state, dev_batch(0))
    compile_loss = float(m["loss"])

    times = []
    for i in range(iters):
        b = dev_batch(i + 1)
        t0 = time.time()
        state, m = step_fn(state, b)
        float(m["loss"])
        times.append(time.time() - t0)
    best = min(times)
    sps = batch * T / best
    print(f"# batch {batch} x {T} crop | best {best * 1e3:.1f} ms/step | "
          f"loss {compile_loss:.4f}", file=sys.stderr)
    # reference: 7.5 days / 2M steps = 0.324 s/step at batch 8 x 6400
    # (README.md:38) => 158k samples/s on its GPU
    ref_sps = 8 * 6400 / 0.324
    print(json.dumps({
        "metric": "train_samples_per_sec",
        "value": round(sps, 0),
        "unit": "samples/s",
        "vs_baseline": round(sps / ref_sps, 2),
    }))


if __name__ == "__main__":
    main()
