"""Streaming-synthesis benchmark: time-to-first-audio and sustained
single-stream rate for long-form audio (synthesis/streaming.py).

The streaming path's promise is latency + boundedness: first audio after
ONE window's synthesis regardless of utterance length, constant memory,
one compiled shape.  This measures both on hardware and prints one JSON
line.

Env knobs: STREAM_SECONDS (30 — utterance length) | BENCH_CONFIG (lj22k)
| STREAM_CHUNK_FRAMES (default: plan_chunks default)
| STREAM_PARALLEL_ROWS (0 — when >0, ALSO time the offline
  sequence-parallel path, synthesize_time_parallel with rows_per_pass=N,
  and report its long-form RTF; single chip here, so this measures the
  window-batching win alone — a mesh multiplies it)
| STREAM_PARALLEL_NOISE (host | device — positional device noise kills
  the z upload) | STREAM_PARALLEL_PCM16 (0/1 — on-device int16, halves
  readback; requires device noise)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet
    from flowavenet_tpu.synthesis.streaming import plan_chunks, stream_reverse
    from flowavenet_tpu.synthesis.synthesize import resolve_compute_dtype

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    utt_s = float(os.environ.get("STREAM_SECONDS", "30"))
    chunk_frames = os.environ.get("STREAM_CHUNK_FRAMES")
    chunk_frames = int(chunk_frames) if chunk_frames else None

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    frames = int(utt_s * sr) // hop
    rng = np.random.RandomState(0)
    mel = rng.rand(frames, cfg.audio.num_mels).astype(np.float32)

    params = init_flowavenet(jax.random.PRNGKey(0), cfg.model)
    dt = resolve_compute_dtype(cfg, None)
    params = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)

    plan = plan_chunks(cfg, frames, chunk_frames)
    print(f"# {jax.devices()[0].device_kind} | {utt_s:.0f}s utterance | "
          f"chunk {plan.chunk_frames}f ({plan.chunk_frames * hop / sr:.2f}s)"
          f" halo {plan.halo_frames}f window {plan.window_frames}f "
          f"x{plan.n_chunks}", file=sys.stderr)

    # warm the (single) compiled window shape
    t0 = time.time()
    next(stream_reverse(params, cfg, mel, seed=0,
                        chunk_frames=chunk_frames))
    print(f"# compile+first {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    ttfa = None
    total = 0
    for start, audio in stream_reverse(params, cfg, mel, seed=1,
                                       chunk_frames=chunk_frames):
        if ttfa is None:
            ttfa = time.time() - t0
        total += audio.shape[0]
    wall = time.time() - t0
    assert total == plan.total_frames * hop

    rtf = total / sr / wall
    # compute overhead of the halo re-synthesis vs one-shot
    overhead = plan.n_chunks * plan.window_frames / plan.total_frames
    print(f"# first audio {ttfa * 1e3:.1f} ms | {total / sr:.1f}s audio in "
          f"{wall:.2f}s | halo compute overhead x{overhead:.2f}",
          file=sys.stderr)

    par_rtf = None
    par_rows = int(os.environ.get("STREAM_PARALLEL_ROWS", "0"))
    par_noise = os.environ.get("STREAM_PARALLEL_NOISE", "host")
    par_pcm16 = bool(int(os.environ.get("STREAM_PARALLEL_PCM16", "0")))
    if par_rows > 0:
        from flowavenet_tpu.synthesis.streaming import (
            synthesize_time_parallel)
        kw = dict(chunk_frames=chunk_frames, rows_per_pass=par_rows,
                  noise=par_noise, pcm16=par_pcm16)
        t0 = time.time()
        out = synthesize_time_parallel(params, cfg, mel, seed=2, **kw)
        warm = time.time() - t0  # includes the batched shape's compile
        t0 = time.time()
        out = synthesize_time_parallel(params, cfg, mel, seed=3, **kw)
        par_wall = time.time() - t0
        assert out.shape[0] == plan.total_frames * hop
        if not par_pcm16:
            assert np.all(np.isfinite(out))
        par_rtf = out.shape[0] / sr / par_wall
        print(f"# time-parallel rows={par_rows} noise={par_noise}"
              f"{' pcm16' if par_pcm16 else ''}: "
              f"{out.shape[0] / sr:.1f}s "
              f"audio in {par_wall:.2f}s = {par_rtf:.1f}x RT "
              f"(warm incl. compile {warm:.1f}s)", file=sys.stderr)

    print(json.dumps({
        "metric": "streaming_ttfa_ms",
        "value": round(ttfa * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(rtf, 2),   # sustained single-stream x RT
        "stream_rtf": round(rtf, 2),
        "chunk_seconds": round(plan.chunk_frames * hop / sr, 3),
        "halo_overhead": round(overhead, 3),
        **({"time_parallel_rtf": round(par_rtf, 2),
            "time_parallel_rows": par_rows} if par_rtf else {}),
    }))


if __name__ == "__main__":
    main()
