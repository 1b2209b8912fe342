"""Benchmark: one-shot synthesis throughput on the flagship model.

Prints ONE JSON line:
  {"metric": "synthesis_khz_per_sec_per_chip", "value": N, "unit": "kHz/s",
   "vs_baseline": M}

value        = kHz of 22.05 kHz audio synthesized per wall-second per chip
vs_baseline  = x real-time (value / 22.05); reference baseline is 1x real
               time as the unit (the reference repo publishes no RTF; its
               only number is 836 ms/utterance on a 2018 GPU,
               /root/reference/example.ipynb cell 7).

Run flags (env):
  BENCH_BATCH      batch of utterances per reverse pass   (default 16)
  BENCH_SECONDS    seconds of audio per utterance         (default 4)
  BENCH_ITERS      timed iterations                       (default 5)
  BENCH_CONFIG     config preset                          (default lj22k)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    seconds = float(os.environ.get("BENCH_SECONDS", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    sq = cfg.model.squeeze_factor
    frames = int(seconds * sr) // hop
    while (frames * hop) % sq != 0 and frames > 1:
        frames -= 1
    T = frames * hop

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} | model: "
          f"{cfg.model.n_block}x{cfg.model.n_flow} flows | "
          f"batch {batch} x {T / sr:.2f}s", file=sys.stderr)

    params = init_flowavenet(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(batch, T, 1), jnp.float32) * cfg.train.temp
    c = jnp.asarray(rng.rand(batch, frames, cfg.model.num_mels), jnp.float32)

    @jax.jit
    def synth(params, z, c):
        return reverse(params, cfg.model, z, c, compute_dtype=jnp.bfloat16)

    # warmup / compile
    t0 = time.time()
    out = synth(params, z, c)
    out.block_until_ready()
    compile_s = time.time() - t0
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32)))), \
        "non-finite synthesis output"

    times = []
    for _ in range(iters):
        t0 = time.time()
        synth(params, z, c).block_until_ready()
        times.append(time.time() - t0)
    best = min(times)

    samples_per_sec = batch * T / best
    khz = samples_per_sec / 1000.0
    rtf = samples_per_sec / sr
    print(f"# compile {compile_s:.1f}s | best {best * 1e3:.1f} ms "
          f"for {batch}x{T / sr:.2f}s | {rtf:.1f}x real-time",
          file=sys.stderr)
    print(json.dumps({
        "metric": "synthesis_khz_per_sec_per_chip",
        "value": round(khz, 2),
        "unit": "kHz/s",
        "vs_baseline": round(rtf, 2),
    }))


if __name__ == "__main__":
    main()
