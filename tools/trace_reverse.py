"""Capture a jax.profiler trace of one full reverse pass (synthesis) and
print a per-op time summary parsed from the chrome trace.

The trace attributes REAL in-model time to each block's kernels/fusions —
standalone per-block harnesses over the axon tunnel carry ~25 ms/call of
dispatch+RNG overhead that distorts deep-block numbers.

Env: BENCH_BATCH (96) | BENCH_SECONDS (4) | TRACE_DIR (/tmp/fwn_trace)
"""

from __future__ import annotations

import os
import sys

# runnable without installing the package
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import glob
import gzip
import json
from collections import defaultdict

import jax
import jax.numpy as jnp


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet, reverse
    from flowavenet_tpu.synthesis.synthesize import _usable_frames

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    batch = int(os.environ.get("BENCH_BATCH", "96"))
    seconds = float(os.environ.get("BENCH_SECONDS", "4"))
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/fwn_trace")

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    frames = _usable_frames(int(seconds * sr) // hop, cfg)
    T = frames * hop

    params = jax.jit(lambda k: init_flowavenet(k, cfg.model))(
        jax.random.PRNGKey(0))
    # bf16 tree: the fp32 master tree costs 362 MB of HBM headroom
    # (see bench.py) and synthesis computes in bf16 anyway
    params = jax.tree.map(lambda l: l.astype(jnp.bfloat16), params)

    @jax.jit
    def synth(params, seed):
        kz, kc = jax.random.split(jax.random.PRNGKey(seed))
        z = jax.random.normal(kz, (batch, T, 1), jnp.float32) * 0.7
        c = jax.random.uniform(kc, (batch, frames, cfg.model.num_mels),
                               jnp.float32)
        wav = reverse(params, cfg.model, z, c, compute_dtype=jnp.bfloat16)
        return jnp.sum(wav.astype(jnp.float32) ** 2)

    float(synth(params, 0))  # compile + warm
    with jax.profiler.trace(trace_dir):
        float(synth(params, 1))

    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("no trace file produced", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # Sum device-thread event durations by op name prefix.  Events carry
    # either an ``hlo_op`` arg (plain XLA ops) or a ``jit_synth/...`` path
    # name (Pallas/Mosaic kernel spans) — prefer the most specific label so
    # kernel launches don't all collapse into one "jit_synth" bucket.
    by_op: dict[str, float] = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        # keep only device lanes (XLA Ops / TensorCore), skip host threads
        if "run_id" in args or "hlo_op" in args or name.startswith(
                ("jit_synth", "fusion", "custom-call", "dot", "convolution",
                 "copy", "dynamic", "scan", "while", "all-", "rng",
                 "transpose", "reduce", "concatenate", "pad", "slice",
                 "broadcast", "reshape", "select", "bitcast", "multiply",
                 "add")):
            key = str(args.get("hlo_op") or name)
            key = key.split("/")[-1]           # tail of a span path
            key = key.split("(")[0]
            # strip trailing .<instance number> but keep dotted kernel names
            head, _, tail = key.rpartition(".")
            if head and tail.isdigit():
                key = head
            by_op[key[:64]] += ev["dur"] / 1e3  # us -> ms
            total += ev["dur"] / 1e3
    print(f"# trace: {files[-1]}")
    print(f"# total device op time: {total:.1f} ms")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:10.1f} ms  {k}")


if __name__ == "__main__":
    main()
