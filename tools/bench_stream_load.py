"""Concurrent streaming-clients benchmark (VERDICT r4 item 6).

The stream endpoint was thread-safety-tested but had no LOAD number:
this drives N simultaneous streaming clients against the REAL
SynthesisService.stream() surface (each window its own jitted dispatch,
interleaving at the device queue) and reports what live TTS cares
about under load:

  * per-stream time-to-first-audio (p50 / p99) vs the single-stream
    75-79 ms baseline (tools/bench_single_stream.py),
  * aggregate synthesized kHz/s across all streams,
  * per-stream sustained real-time factor (a stream is viable for live
    playback only while its RTF >= 1).

Prints ONE JSON line.

Env knobs: STREAM_CLIENTS (8) | STREAM_SECONDS (30 — measurement
window) | STREAM_UTT_SECONDS (8 — utterance length per stream request)
| STREAM_CHUNK_FRAMES (plan default) | BENCH_CONFIG (lj22k)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowavenet_tpu.config import get_config
    from flowavenet_tpu.models.flowavenet import init_flowavenet
    from flowavenet_tpu.serving.server import SynthesisService
    from flowavenet_tpu.synthesis.synthesize import resolve_compute_dtype

    cfg = get_config(os.environ.get("BENCH_CONFIG", "lj22k"))
    n_clients = int(os.environ.get("STREAM_CLIENTS", "8"))
    window_s = float(os.environ.get("STREAM_SECONDS", "30"))
    utt_s = float(os.environ.get("STREAM_UTT_SECONDS", "8"))
    chunk_frames = os.environ.get("STREAM_CHUNK_FRAMES")
    chunk_frames = int(chunk_frames) if chunk_frames else None

    dtype = resolve_compute_dtype(cfg, None)
    params = init_flowavenet(jax.random.PRNGKey(0), cfg.model)
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == np.float32 else a, params)

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    frames = int(utt_s * sr) // hop
    rng = np.random.RandomState(0)
    mel = rng.rand(frames, cfg.audio.num_mels).astype(np.float32)

    svc = SynthesisService(params, cfg)
    # warm the compiled window shape once before opening the floodgates
    n, chunks = svc.stream(mel[: min(frames, 4 * (chunk_frames or 128))],
                           seed=0, chunk_frames=chunk_frames)
    for _ in chunks:
        pass

    stop = threading.Event()
    lock = threading.Lock()
    ttfa, stream_rtf = [], []
    samples_done = [0]

    def client(cid: int) -> None:
        k = 0
        while not stop.is_set():
            t0 = time.time()
            n, chunks = svc.stream(mel, seed=cid * 1000 + k,
                                   chunk_frames=chunk_frames)
            first = None
            got = 0
            for block in chunks:
                if first is None:
                    first = time.time() - t0
                got += len(block) // 2
                with lock:
                    samples_done[0] += len(block) // 2
                if stop.is_set():
                    break
            dt = time.time() - t0
            with lock:
                ttfa.append(first)
                if got == n:             # only complete streams rate-count
                    stream_rtf.append((got / sr) / dt)
            k += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    time.sleep(window_s)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    wall = time.time() - t0

    agg_khz = samples_done[0] / wall / 1e3
    agg_rtf = agg_khz * 1e3 / sr
    p50 = float(np.percentile(ttfa, 50) * 1e3) if ttfa else float("nan")
    p99 = float(np.percentile(ttfa, 99) * 1e3) if ttfa else float("nan")
    rtf_p50 = float(np.percentile(stream_rtf, 50)) if stream_rtf \
        else float("nan")
    rtf_min = float(np.min(stream_rtf)) if stream_rtf else float("nan")
    print(f"# {n_clients} stream clients x {utt_s}s utt | "
          f"aggregate {agg_rtf:.1f}x | TTFA p50 {p50:.0f} ms p99 "
          f"{p99:.0f} ms | per-stream RTF p50 {rtf_p50:.1f} min "
          f"{rtf_min:.1f} | {len(ttfa)} streams", file=sys.stderr)
    print(json.dumps({
        "metric": "stream_load_khz_per_sec", "value": round(agg_khz, 1),
        "unit": "kHz/s", "clients": n_clients,
        "aggregate_rtf": round(agg_rtf, 1),
        "ttfa_p50_ms": round(p50, 1), "ttfa_p99_ms": round(p99, 1),
        "stream_rtf_p50": round(rtf_p50, 2),
        "stream_rtf_min": round(rtf_min, 2),
        "streams_measured": len(ttfa),
    }))
    svc.close()


if __name__ == "__main__":
    main()
