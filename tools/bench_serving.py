"""Serving-path benchmark: sustained throughput + request latency through
the dynamic micro-batching service (serving/server.py) on a real chip.

This measures the PRODUCTION serving surface end-to-end — host mels in,
host audio out, per-request seeds, bucket grouping, the device worker's
batching — unlike bench.py, which times the bare jitted reverse with
device-resident inputs.  The delta between the two is the serving tax:
host<->device transfers (per-batch mel upload + audio download) plus
queueing.  In THIS environment the device sits behind a stdio-relay
tunnel, so the transfer term measures the tunnel, not production PCIe;
the JSON line reports aggregate throughput, request latency, and the
dispatch-thread utilization (see below).

Prints ONE JSON line:
  {"metric": "serving_khz_per_sec_per_chip", "value": N, "unit": "kHz/s",
   "vs_baseline": M, "p50_ms": ..., "p99_ms": ..., "dispatch_frac": ...}

dispatch_frac is the fraction of wall time the DISPATCH thread spends in
host prep + async dispatch (the service stats' busy_seconds) — NOT device
occupancy: dispatch returns before the device computes, so a low value
means the pipeline keeps the worker unblocked, and a value near 1 means
per-batch host prep itself is the bottleneck (measured at max_batch>=64).
backpressure_frac is the fraction of wall the dispatch thread spends
BLOCKED handing finished groups to the completion thread (done-queue
bound 2) — i.e. waiting on readback, not doing host work.

Env knobs: SERVE_CLIENTS (48) | SERVE_SECONDS (30 — measurement window)
| SERVE_MAX_BATCH (32) | SERVE_UTT_SECONDS (2.0) | SERVE_WINDOW_MS (10)
| SERVE_MAX_DISPATCH (32 — sub-batch split of large groups)
| BENCH_CONFIG (lj22k)
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
    n_clients = int(os.environ.get("SERVE_CLIENTS", "48"))
    window_s = float(os.environ.get("SERVE_SECONDS", "30"))
    max_batch = int(os.environ.get("SERVE_MAX_BATCH", "32"))
    utt_s = float(os.environ.get("SERVE_UTT_SECONDS", "2.0"))
    window_ms = float(os.environ.get("SERVE_WINDOW_MS", "10"))
    max_dispatch = int(os.environ.get("SERVE_MAX_DISPATCH", "32"))

    dtype = resolve_compute_dtype(cfg, None)
    params = init_flowavenet(jax.random.PRNGKey(0), cfg.model)
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == np.float32 else a, params)

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_size
    frames = int(utt_s * sr) // hop
    rng = np.random.RandomState(0)
    mel = rng.rand(frames, cfg.audio.num_mels).astype(np.float32)

    svc = SynthesisService(params, cfg, max_batch=max_batch,
                           batch_window_ms=window_ms,
                           max_dispatch_rows=max_dispatch)
    print(f"# {jax.devices()[0].device_kind} | {cfg.model.n_block}x"
          f"{cfg.model.n_flow} flows | {n_clients} clients x {utt_s}s "
          f"utterances | max_batch {max_batch}", file=sys.stderr)

    # Warm every pow2 batch shape the window can produce (the service
    # pads group sizes to powers of two; each flagship shape costs
    # minutes to compile but persists in the jax compilation cache).
    from flowavenet_tpu.synthesis.synthesize import synthesize_mels
    sizes, b = [], 1
    # dispatched sub-batches never exceed max_dispatch rows, so that's
    # the largest pow2 shape the service can produce
    warm_to = min(max_batch, max_dispatch)
    while True:  # cover the pow2 bucket ABOVE a non-pow2 cap too
        sizes.append(b)
        if b >= warm_to:
            break
        b *= 2
    for bsz in sizes:
        t0 = time.time()
        synthesize_mels(params, cfg, [mel] * bsz, seed=list(range(bsz)),
                        pad_batch=True, noise=svc.noise, pcm16=svc.pcm16)
        print(f"# warm batch {bsz}: {time.time() - t0:.1f}s",
              file=sys.stderr)

    stop = threading.Event()
    lat_lock = threading.Lock()
    latencies: list[float] = []
    audio_s = [0.0]

    def client(cid: int) -> None:
        crng = np.random.RandomState(cid)
        while not stop.is_set():
            t = time.time()
            wav = svc.submit(mel, seed=int(crng.randint(1 << 31)))
            dt = time.time() - t
            with lat_lock:
                latencies.append(dt)
                audio_s[0] += len(wav) / sr
            del wav

    base = dict(svc.stats)
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

    with lat_lock:
        lat = np.sort(np.asarray(latencies))
        total_audio = audio_s[0]
    busy = svc.stats["busy_seconds"] - base["busy_seconds"]
    blocked = (svc.stats["backpressure_seconds"]
               - base.get("backpressure_seconds", 0.0))
    nreq = svc.stats["requests"] - base["requests"]
    nbatch = svc.stats["batches"] - base["batches"]
    svc.close()
    if len(lat) == 0:
        raise SystemExit("no requests completed inside the window")

    khz = total_audio * sr / wall / 1000.0
    print(f"# {len(lat)} requests in {wall:.1f}s | "
          f"{nreq / max(nbatch, 1):.1f} req/batch | "
          f"dispatch thread busy {busy / wall:.0%} "
          f"(+{blocked / wall:.0%} blocked on readback)", file=sys.stderr)
    print(json.dumps({
        "metric": "serving_khz_per_sec_per_chip",
        "value": round(khz, 2),
        "unit": "kHz/s",
        "vs_baseline": round(khz * 1000.0 / sr, 2),
        "p50_ms": round(float(lat[len(lat) // 2]) * 1000, 1),
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1000, 1),
        "dispatch_frac": round(busy / wall, 3),
        "backpressure_frac": round(blocked / wall, 3),
    }))


if __name__ == "__main__":
    main()
