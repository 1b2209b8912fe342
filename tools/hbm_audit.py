"""AOT HBM audit of the one-shot reverse at a given (batch, seconds).

Compiles bench.py's exact jitted synthesis function WITHOUT executing it
and prints XLA's memory analysis (argument / output / temp / peak bytes).
This is how the b128 x 9.76 s OOM (docs/benchmarks.md bench notes) is
attributed to specific buffers instead of guessed at: compare peaks
across shapes and code changes without risking a wedged tunnel on a
real OOM.

Usage:  python tools/hbm_audit.py [batch seconds ...]   (pairs)
        FWN_INT8=0 python tools/hbm_audit.py 128 9.76
"""

from __future__ import annotations

import os
import sys
import time


def audit(batch: int, seconds: float, cfg) -> None:
    import jax
    import jax.numpy as jnp

    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse
    from flowavenet_tpu.synthesis.synthesize import _usable_frames

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    sq = cfg.model.squeeze_factor
    frames = int(seconds * sr) // hop
    if frames >= 30 and (30 * hop) % sq == 0:
        frames -= frames % 30      # bucket-snap to match bench.py's shapes
    frames = _usable_frames(frames, cfg)
    T = frames * hop

    params = jax.eval_shape(
        lambda k: init_flowavenet(k, cfg.model), jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, jnp.bfloat16), params)

    def synth(params, seed):
        kz, kc = jax.random.split(jax.random.PRNGKey(seed))
        z = jax.random.normal(kz, (batch, T, 1), jnp.float32) * cfg.train.temp
        c = jax.random.uniform(kc, (batch, frames, cfg.model.num_mels),
                               jnp.float32)
        wav = reverse(params, cfg.model, z, c, compute_dtype=jnp.bfloat16)
        w32 = wav.astype(jnp.float32)
        return jnp.sum(w32 * w32)

    t0 = time.time()
    lowered = jax.jit(synth).lower(
        params, jax.ShapeDtypeStruct((), jnp.int32))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 / 2**30
    print(f"b{batch} x {T / sr:.2f}s (T={T}): compile {time.time()-t0:.0f}s")
    if ma is None:
        print("  memory_analysis unavailable on this backend")
        return
    print(f"  args      {ma.argument_size_in_bytes * gb:7.2f} GiB")
    print(f"  output    {ma.output_size_in_bytes * gb:7.2f} GiB")
    print(f"  temp      {ma.temp_size_in_bytes * gb:7.2f} GiB")
    print(f"  peak(sum) {(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes) * gb:7.2f} GiB")


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))

    pairs = sys.argv[1:] or ["128", "6.97"]
    assert len(pairs) % 2 == 0, "args are (batch seconds) pairs"
    for i in range(0, len(pairs), 2):
        audit(int(pairs[i]), float(pairs[i + 1]), cfg)


if __name__ == "__main__":
    main()
