"""On-hardware kernel equivalence: reverse() with the Pallas kernels vs the
pure-XLA path, RANDOMIZED params, same inputs, on the real TPU.

The CPU test suite proves the kernels in interpret mode; this closes the
remaining gap (real Mosaic lowering) — the bench's energy checksum cannot
(untrained couplings are identities, so kernel bugs that vanish at
identity weights would pass it).

Prints per-block-routing max-abs/rel differences and PASS/FAIL.
Env: VK_BATCH (4) | VK_SECONDS (1) | VK_CONFIG (lj22k)
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    # This tool checks the Mosaic LOWERING against XLA, so it compares the
    # quality-exact bf16 kernels by default even though production
    # defaults to int8 (whose quantization noise on randomized weights
    # sits below this tool's 0.999 bar by design — trained-weight int8
    # quality is gated separately by tools/int8_quality_gate.py).
    # FWN_INT8=1 in the environment still forces an int8 measurement.
    os.environ.setdefault("FWN_INT8", "0")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse

    cfg = get_config(os.environ.get("VK_CONFIG", "lj22k")).model
    batch = int(os.environ.get("VK_BATCH", "4"))
    seconds = float(os.environ.get("VK_SECONDS", "1"))
    sr = 22050
    hop = cfg.hop_size
    frames = max(1, int(seconds * sr) // hop)
    if frames >= 30:
        frames -= frames % 30
    while (frames * hop) % cfg.squeeze_factor != 0:
        frames += 1
    T = frames * hop

    params = jax.jit(lambda k: init_flowavenet(k, cfg))(jax.random.PRNGKey(0))
    # randomize so couplings/actnorms are NOT identities
    leaves, treedef = jax.tree.flatten(params)
    r = np.random.RandomState(7)
    params = jax.tree.unflatten(
        treedef, [(l + jnp.asarray(0.05 * r.randn(*l.shape), l.dtype))
                  .astype(jnp.bfloat16) for l in leaves])

    kz, kc = jax.random.split(jax.random.PRNGKey(1))
    z = jax.random.normal(kz, (batch, T, 1), jnp.float32) * 0.7
    c = jax.random.uniform(kc, (batch, frames, cfg.num_mels), jnp.float32)

    cfg_on = dataclasses.replace(cfg, use_pallas=True)
    cfg_off = dataclasses.replace(cfg, use_pallas=False)

    wav_on = np.asarray(jax.jit(
        lambda p, z, c: reverse(p, cfg_on, z, c, compute_dtype=jnp.bfloat16)
    )(params, z, c), np.float32)
    wav_off = np.asarray(jax.jit(
        lambda p, z, c: reverse(p, cfg_off, z, c, compute_dtype=jnp.bfloat16)
    )(params, z, c), np.float32)

    diff = np.abs(wav_on - wav_off)
    scale = np.abs(wav_off).max()
    rel = diff.max() / max(scale, 1e-9)
    corr = float(np.corrcoef(wav_on.ravel(), wav_off.ravel())[0, 1])
    print(f"batch {batch} x {T / sr:.2f}s | out scale {scale:.3g} | "
          f"max abs diff {diff.max():.3g} | max rel {rel:.3g} | "
          f"corr {corr:.6f}")
    # both paths run the same math in bf16; tolerate accumulated bf16
    # divergence through 48 flows but nothing structural
    ok = np.isfinite(wav_on).all() and rel < 0.15 and corr > 0.999
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
