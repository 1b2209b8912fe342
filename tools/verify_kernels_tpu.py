"""On-hardware kernel equivalence: the Pallas kernel routes vs the
pure-XLA path, RANDOMIZED params, same inputs, on the real TPU.

The CPU test suite proves the kernels in interpret mode; this closes the
remaining gap (real Mosaic lowering) — the bench's energy checksum cannot
(untrained couplings are identities, so kernel bugs that vanish at
identity weights would pass it).

The GATE is per block: one block bounds the bf16 accumulation to 6 flows,
so a structural lowering bug shows as a large deviation while honest
rounding noise stays small.  The full-model comparison is printed as INFO
only — randomized (non-physical) params make the 48-flow composition
chaotic (output scale ~150), where reordered-but-equal bf16 summation
(e.g. the cond-perm weight-row permutation) amplifies into percent-level
divergence with no bug present; measured fp32 interpret equivalence at
the same geometry is ~2e-6.

Env: VK_BATCH (4) | VK_SECONDS (1) | VK_CONFIG (lj22k)
FWN_INT8=1 forces the int8 route (adds ~1%/block quantization noise —
this tool then gates at the looser int8 bar; trained-weight int8 quality
is gated separately by tools/int8_quality_gate.py).
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import dataclasses

import numpy as np


def main() -> None:
    # Lowering check defaults to the quality-exact bf16 kernels even
    # though production defaults to int8 (see module docstring).
    os.environ.setdefault("FWN_INT8", "0")
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models import flowavenet as fwn
    from flowavenet_tpu.models.flowavenet import (block_reverse,
                                                  init_flowavenet, reverse)

    int8 = fwn.PAIR_KERNEL_INT8
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

    cfg_on = dataclasses.replace(cfg, use_pallas=True)
    cfg_off = dataclasses.replace(cfg, use_pallas=False)

    # --- per-block gate -----------------------------------------------------
    # int8 quantizes weights (~0.8%) and activations per call; 6 flows of
    # that stack to a few percent.  bf16 kernels against bf16 XLA differ
    # only by fusion/accumulation order.
    rel_bar = 0.08 if int8 else 0.02
    corr_bar = 0.998 if int8 else 0.9995
    ok = True
    for b in range(cfg.n_block):
        Tb = T // (2 ** (b + 1))
        Cx = 2 ** (b + 1)
        Cc = cfg.num_mels * (2 ** (b + 1))
        bp = params["blocks"][b]
        kx, kc2 = jax.random.split(jax.random.PRNGKey(b + 1))
        x = jax.random.normal(kx, (batch, Tb, Cx), jnp.bfloat16)
        c = jax.random.normal(kc2, (batch, Tb, Cc), jnp.bfloat16)

        def run(cfg_b):
            out, _, _ = block_reverse(bp, cfg_b, x, c, None)
            return out

        w_on = np.asarray(jax.jit(lambda: run(cfg_on))(), np.float32)
        w_off = np.asarray(jax.jit(lambda: run(cfg_off))(), np.float32)
        scale = max(np.abs(w_off).max(), 1e-9)
        rel = np.abs(w_on - w_off).max() / scale
        corr = float(np.corrcoef(w_on.ravel(), w_off.ravel())[0, 1])
        good = np.isfinite(w_on).all() and rel < rel_bar and corr > corr_bar
        ok = ok and good
        print(f"block {b}: T={Tb:>6} Cc={Cc:>5} rel={rel:.4f} "
              f"corr={corr:.6f} {'ok' if good else 'MISMATCH'}", flush=True)

    # --- full model (INFO only; chaotic on randomized params) ---------------
    kz, kc = jax.random.split(jax.random.PRNGKey(1))
    z = jax.random.normal(kz, (batch, T, 1), jnp.float32) * 0.7
    c = jax.random.uniform(kc, (batch, frames, cfg.num_mels), jnp.float32)
    wav_on = np.asarray(jax.jit(
        lambda p, z, c: reverse(p, cfg_on, z, c, compute_dtype=jnp.bfloat16)
    )(params, z, c), np.float32)
    wav_off = np.asarray(jax.jit(
        lambda p, z, c: reverse(p, cfg_off, z, c, compute_dtype=jnp.bfloat16)
    )(params, z, c), np.float32)
    diff = np.abs(wav_on - wav_off)
    scale = np.abs(wav_off).max()
    corr = float(np.corrcoef(wav_on.ravel(), wav_off.ravel())[0, 1])
    print(f"full model (info): batch {batch} x {T / sr:.2f}s | out scale "
          f"{scale:.3g} | max rel {diff.max() / max(scale, 1e-9):.3g} | "
          f"corr {corr:.6f}")
    ok = ok and bool(np.isfinite(wav_on).all())

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
