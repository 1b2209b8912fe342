"""Single-stream (batch-1) synthesis latency — repeatable device-time
measurement (VERDICT r3 item 8).

The one-shot batch-1 wall time through this environment's stdio-relay
tunnel is dominated by dispatch + scalar-readback round-trips (~31 ms);
the DEVICE computes the reverse in a few ms.  Round 3's 4.5 ms /155x
single-stream claim rested on one profiler-trace reading; this harness
makes it reproducible without trace parsing:

  * chain N reverses inside ONE jit via lax.fori_loop (each iteration
    draws fresh noise from fold_in(key, i), so XLA cannot elide any),
    fence once on a scalar;
  * device time per reverse = (wall(N_hi) - wall(N_lo)) / (N_hi - N_lo)
    — the two-point difference cancels the constant dispatch/readback
    overhead, which the single-call wall row reports separately.

Prints one JSON line.  Env knobs: BENCH_CONFIG (lj22k) | SS_SECONDS
(0.7 — clip length, matching the docs row) | SS_NLO / SS_NHI (2 / 18)
| SS_ITERS (5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse
    from flowavenet_tpu.synthesis.synthesize import _usable_frames

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    seconds = float(os.environ.get("SS_SECONDS", "0.7"))
    n_lo = int(os.environ.get("SS_NLO", "2"))
    n_hi = int(os.environ.get("SS_NHI", "18"))
    iters = int(os.environ.get("SS_ITERS", "5"))

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    frames = _usable_frames(int(seconds * sr) // hop, cfg)
    T = frames * hop

    params = jax.jit(lambda k: init_flowavenet(k, cfg.model))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda l: l.astype(jnp.bfloat16), params)

    def chained(n):
        @jax.jit
        def f(params, seed, c):
            def body(i, acc):
                z = jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(seed), i),
                    (1, T, 1), jnp.float32) * cfg.train.temp
                wav = reverse(params, cfg.model, z, c,
                              compute_dtype=jnp.bfloat16)
                w32 = wav.astype(jnp.float32)
                return acc + jnp.sum(w32 * w32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return f

    c = jax.random.uniform(jax.random.PRNGKey(1),
                           (1, frames, cfg.model.num_mels), jnp.float32)
    f_lo, f_hi = chained(n_lo), chained(n_hi)

    def best(f, name):
        t0 = time.time()
        float(f(params, 0, c))
        print(f"# {name}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for i in range(iters):
            t0 = time.time()
            float(f(params, i + 1, c))
            ts.append(time.time() - t0)
        return min(ts)

    t_lo = best(f_lo, f"chain x{n_lo}")
    t_hi = best(f_hi, f"chain x{n_hi}")
    dev_ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    wall_ms = t_lo * 1e3 - (n_lo - 1) * dev_ms  # single-dispatch wall
    rtf_dev = (T / sr) / (dev_ms / 1e3)
    print(f"# {T/sr:.2f}s clip | device {dev_ms:.2f} ms/reverse "
          f"({rtf_dev:.0f}x single-stream) | single-dispatch wall "
          f"~{wall_ms:.1f} ms (tunnel overhead ~{wall_ms - dev_ms:.1f} ms)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "single_stream_device_ms",
        "value": round(dev_ms, 2),
        "unit": "ms",
        "vs_baseline": round(rtf_dev, 1),
        "clip_seconds": round(T / sr, 3),
        "single_dispatch_wall_ms": round(wall_ms, 1),
    }))


if __name__ == "__main__":
    main()
