"""Per-block reverse-pass profile at synthesis shapes.

Times each block's ``block_reverse`` (including its unsqueeze) separately,
plus the mel upsampler and the end-to-end reverse, on the current backend.
Mirrors bench.py methodology: inputs are generated on device inside the
jitted function and execution is fenced by a scalar readback (the axon
tunnel makes host<->device transfers and block_until_ready unreliable
timers).

Env knobs: BENCH_BATCH (96) | BENCH_SECONDS (4) | BENCH_ITERS (3) |
BENCH_CONFIG (lj22k)
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import time

import jax
import jax.numpy as jnp


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import (block_reverse,
                                                  init_flowavenet, reverse)
    from flowavenet_tpu.models.upsample import apply_upsample

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k")).model
    batch = int(os.environ.get("BENCH_BATCH", "96"))
    seconds = float(os.environ.get("BENCH_SECONDS", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    sr = 22050
    hop = cfg.hop_size
    frames = int(seconds * sr) // hop
    while (frames * hop) % cfg.squeeze_factor != 0 and frames > 1:
        frames -= 1
    T = frames * hop

    params = jax.jit(lambda k: init_flowavenet(k, cfg))(jax.random.PRNGKey(0))

    def timed(fn, *args):
        t0 = time.time()
        float(fn(*args))  # compile + fence
        compile_s = time.time() - t0
        best = float("inf")
        for i in range(iters):
            t0 = time.time()
            float(fn(*args))
            best = min(best, time.time() - t0)
        return best, compile_s

    print(f"# {jax.devices()[0].device_kind} | batch {batch} x {T/sr:.2f}s "
          f"| {cfg.n_block}x{cfg.n_flow}", file=sys.stderr, flush=True)

    # --- per block: inputs at that block's (squeezed) resolution ----------
    total = 0.0
    for b in range(cfg.n_block):
        Tb = T // (2 ** (b + 1))
        Cx = 2 ** (b + 1)
        Cc = cfg.num_mels * (2 ** (b + 1))
        bp = params["blocks"][b]

        @jax.jit
        def one(bp, seed, _b=b, _Tb=Tb, _Cx=Cx, _Cc=Cc):
            kx, kc = jax.random.split(jax.random.PRNGKey(seed))
            x = jax.random.normal(kx, (batch, _Tb, _Cx), jnp.bfloat16)
            c = jax.random.normal(kc, (batch, _Tb, _Cc), jnp.bfloat16)
            x2, _, _ = block_reverse(bp, cfg, x, c, None)
            return jnp.sum(x2.astype(jnp.float32) ** 2)

        best, comp = timed(one, bp, b)
        total += best
        print(f"block {b}: T={Tb:>6} Cc={Cc:>5} {best*1e3:8.1f} ms "
              f"(compile {comp:.0f}s)", flush=True)

    # --- upsampler ---------------------------------------------------------
    @jax.jit
    def ups(p, seed):
        c = jax.random.uniform(jax.random.PRNGKey(seed),
                               (batch, frames, cfg.num_mels), jnp.bfloat16)
        return jnp.sum(apply_upsample(p, c, cfg.upsample_scales)
                       .astype(jnp.float32) ** 2)

    best, comp = timed(ups, params["upsample"], 0)
    total += best
    print(f"upsample: {best*1e3:8.1f} ms (compile {comp:.0f}s)", flush=True)

    # --- end to end --------------------------------------------------------
    @jax.jit
    def full(params, seed):
        kz, kc = jax.random.split(jax.random.PRNGKey(seed))
        z = jax.random.normal(kz, (batch, T, 1), jnp.float32) * 0.7
        c = jax.random.uniform(kc, (batch, frames, cfg.num_mels), jnp.float32)
        wav = reverse(params, cfg, z, c, compute_dtype=jnp.bfloat16)
        return jnp.sum(wav.astype(jnp.float32) ** 2)

    best, comp = timed(full, params, 0)
    rtf = batch * T / best / sr
    print(f"stage-sum {total*1e3:8.1f} ms")
    print(f"end-to-end {best*1e3:8.1f} ms (compile {comp:.0f}s) "
          f"= {rtf:.0f}x real-time", flush=True)


if __name__ == "__main__":
    main()
