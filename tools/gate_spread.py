"""Per-utterance, repeated-seed spread for the route quality gate
(VERDICT r4 item 7).

Round 4's 50k gate read mel-corr 0.9236 (XLA) / 0.9051 (bf16 kernels) /
0.9235 (int8 kernels) from ONE noise draw — int8 tying XLA while the
"quality-exact" bf16 route dropped 0.02 is backwards, and a single-draw
criterion cannot distinguish noise from a systematic kernel issue.  This
tool answers it with distributions: for each utterance and each route it
synthesizes N independent noise draws (shared across routes seed-for-
seed) and reports per-utterance mean +- spread plus the per-(utterance,
seed) PAIRED route deltas — the paired delta removes the draw-to-draw
variance that dominates mel-corr on a 6-utterance corpus.

Usage:
  python tools/gate_spread.py CKPT_DIR DATA_DIR [--config lj22k]
      [--seeds 8] [--frames 200] [--cpu] [--json OUT]

CKPT_DIR: a training logdir's ``pretrained`` dir (tools/
int8_quality_gate.py layout); DATA_DIR: preprocessed corpus with mels/.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir")
    p.add_argument("data_dir")
    p.add_argument("--config", default="lj22k")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.audio.mel import process_wav
    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models import flowavenet as fwn
    from flowavenet_tpu.models.flowavenet import reverse
    from flowavenet_tpu.synthesis.synthesize import (_usable_frames,
                                                     load_params)

    cfg = get_config(args.config)
    params, step = load_params(args.ckpt_dir, cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    print(f"checkpoint step {step}")

    mels = [np.load(f) for f in
            sorted(glob.glob(os.path.join(args.data_dir, "mels", "*.npy")))]
    names = [os.path.basename(f) for f in
             sorted(glob.glob(os.path.join(args.data_dir, "mels",
                                           "*.npy")))]
    frames = _usable_frames(min(min(m.shape[0] for m in mels),
                                args.frames), cfg)
    c = jnp.asarray(np.stack([m[:frames] for m in mels]), jnp.float32)
    T = frames * cfg.audio.hop_size
    U = c.shape[0]

    if args.cpu:
        fwn.PAIR_KERNEL_CPU_INTERPRET = True

    routes = ("xla", "bf16", "int8")

    def synth(route: str, z):
        fwn.PAIR_KERNEL_INT8 = route == "int8"
        m = dataclasses.replace(cfg.model, use_pallas=route != "xla")
        out = jax.jit(lambda p, z, c: reverse(p, m, z, c,
                                              compute_dtype=jnp.bfloat16))(
            params, z, c)
        return np.asarray(out.astype(jnp.float32))

    def corr(a, b):
        return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])

    # mc[route][seed][utt]
    mc = {r: np.zeros((args.seeds, U)) for r in routes}
    for s in range(args.seeds):
        z = jax.random.normal(jax.random.PRNGKey(1000 + s), (U, T, 1),
                              jnp.float32) * 0.7
        for r in routes:
            wavs = synth(r, z)
            for i in range(U):
                _, m = process_wav(wavs[i, :, 0], cfg.audio)
                n = min(m.shape[0], frames)
                mc[r][s, i] = corr(m[:n], np.asarray(c[i, :n]))
        print(f"seed {s}: " + "  ".join(
            f"{r}={mc[r][s].mean():.4f}" for r in routes), file=sys.stderr)
    fwn.PAIR_KERNEL_INT8 = False

    print(f"\nper-utterance mel-corr over {args.seeds} seeds "
          f"(mean +- std [min..max]):")
    for i in range(U):
        row = f"  {names[i]:<14}"
        for r in routes:
            v = mc[r][:, i]
            row += (f"  {r}: {v.mean():.4f}+-{v.std():.4f} "
                    f"[{v.min():.4f}..{v.max():.4f}]")
        print(row)

    print("\ncorpus means per seed (the round-4 gate statistic):")
    for r in routes:
        v = mc[r].mean(axis=1)
        print(f"  {r}: {v.mean():.4f} +- {v.std():.4f} "
              f"[{v.min():.4f}..{v.max():.4f}]")

    print("\nPAIRED route deltas (same utterance, same seed):")
    stats = {}
    for a, b in (("bf16", "xla"), ("int8", "xla"), ("int8", "bf16")):
        d = (mc[a] - mc[b]).ravel()
        stats[f"{a}-{b}"] = dict(mean=float(d.mean()),
                                 std=float(d.std()),
                                 min=float(d.min()), max=float(d.max()))
        print(f"  {a} - {b}: {d.mean():+.4f} +- {d.std():.4f} "
              f"[{d.min():+.4f} .. {d.max():+.4f}]")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"step": int(step), "seeds": args.seeds,
                       "frames": int(frames),
                       "per_route_seed_means":
                           {r: mc[r].mean(axis=1).tolist()
                            for r in routes},
                       "paired_deltas": stats}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
