"""Training-throughput benchmark (companion to bench.py's synthesis metric).

Times the full jitted train step (forward + grads + clip + Adam) with
donated state and, by default, device-generated batches; prints one JSON
line.

BENCH_DATA=<dir> switches to the REAL input pipeline (VERDICT r4 item
3): batches come from the actual CropDataset / native loader over a
preprocessed corpus — host crop assembly, the ~4.3 MB/step upload at
b8 (68 MB at b128), prefetch — so the number is what a user's training
loop actually sees.  Reports the loader-stall term separately
(host_ms = time the step loop spends outside the device step: batch
fetch + upload dispatch).

Env knobs: BENCH_BATCH (8) | BENCH_CONFIG (lj22k) | BENCH_ITERS (3)
| BENCH_DATA (unset = synthetic device batches) | BENCH_LOADER
  (python | native, with BENCH_DATA) | BENCH_BF16_UPLOAD (0/1 — cast
  audio/mel to bf16 on host before upload, halving tunnel bytes; the
  serving-path trick applied to training)
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

    data_dir = os.environ.get("BENCH_DATA")
    bf16_upload = os.environ.get("BENCH_BF16_UPLOAD", "0") == "1"
    if data_dir:
        loader = os.environ.get("BENCH_LOADER", "native")
        if loader == "native":
            from flowavenet_tpu.data.native_loader import \
                NativeCropDataset as DatasetCls
        else:
            from flowavenet_tpu.data.dataset import CropDataset as DatasetCls
        ds = DatasetCls(os.path.join(data_dir, "train.fwrec"),
                        hop_size=cfg.audio.hop_size, max_time_steps=T,
                        batch_size=batch, seed=0)
        it = ds.iterate(start_step=0)

        def host_batch():
            b = next(it)
            if bf16_upload:
                # halve the tunnel upload; the jitted step casts to its
                # compute dtype (bf16) anyway, so quality is unchanged
                b = {k: v.astype(jnp.bfloat16) for k, v in b.items()}
            return b

        get_batch = host_batch
    else:
        @jax.jit
        def dev_batch(seed):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            return {
                "audio": jax.random.normal(k1, (batch, T, 1),
                                           jnp.float32) * 0.1,
                "mel": jax.random.uniform(k2, (batch, frames,
                                               cfg.model.num_mels),
                                          jnp.float32),
            }

        counter = [0]

        def get_batch():
            counter[0] += 1
            return dev_batch(counter[0])

    step_fn = jax.jit(make_train_step(cfg), donate_argnums=0)
    state, m = step_fn(state, get_batch())
    compile_loss = float(m["loss"])

    times, host_times = [], []
    for i in range(iters):
        t0 = time.time()
        b = get_batch()
        th = time.time() - t0
        state, m = step_fn(state, b)
        float(m["loss"])
        times.append(time.time() - t0)
        host_times.append(th)
    best = min(times)
    sps = batch * T / best
    mode = f"real loader ({os.environ.get('BENCH_LOADER', 'native')})" \
        if data_dir else "synthetic device batches"
    print(f"# batch {batch} x {T} crop | {mode}"
          f"{' bf16-upload' if bf16_upload else ''} | best "
          f"{best * 1e3:.1f} ms/step (host {min(host_times) * 1e3:.1f} ms)"
          f" | loss {compile_loss:.4f}", file=sys.stderr)
    # reference: 7.5 days / 2M steps = 0.324 s/step at batch 8 x 6400
    # (README.md:38) => 158k samples/s on its GPU
    ref_sps = 8 * 6400 / 0.324
    print(json.dumps({
        "metric": "train_samples_per_sec",
        "value": round(sps, 0),
        "unit": "samples/s",
        "vs_baseline": round(sps / ref_sps, 2),
        "step_ms": round(best * 1e3, 1),
        "host_ms": round(min(host_times) * 1e3, 1),
        "input": "real" if data_dir else "synthetic",
    }))


if __name__ == "__main__":
    main()
